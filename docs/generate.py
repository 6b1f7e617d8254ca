#!/usr/bin/env python
"""Generate HTML API documentation into docs/api/ (stdlib pydoc).

The reference ships a Doxyfile (``doxygen Doxyfile`` -> docs/doxygen,
reference README.md:29-31); this is the equivalent for the Python
package: one HTML page per module, plus an index.

Run: python docs/generate.py   (CPU-only; imports the package)
"""

import os
import pkgutil
import pydoc
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "api")


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import volume_renderer_tpu

    os.makedirs(OUT, exist_ok=True)
    os.chdir(OUT)

    names = ["volume_renderer_tpu"]
    for pkg in pkgutil.walk_packages(volume_renderer_tpu.__path__,
                                     prefix="volume_renderer_tpu."):
        names.append(pkg.name)

    for name in names:
        try:
            pydoc.writedoc(name)
            print(f"wrote {name}.html")
        except Exception as exc:  # pragma: no cover - best effort per module
            print(f"SKIP {name}: {exc}")

    index = "\n".join(
        f'<li><a href="{n}.html">{n}</a></li>' for n in sorted(names))
    with open("index.html", "w") as f:
        f.write(f"<html><body><h1>volume_renderer_tpu API</h1>"
                f"<ul>{index}</ul></body></html>\n")
    print(f"index + {len(names)} pages in {OUT}")


if __name__ == "__main__":
    main()
