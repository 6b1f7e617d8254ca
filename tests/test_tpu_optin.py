"""Opt-in real-chip smoke test: set VRT_TPU_TESTS=1 to run.

tests/conftest.py pins pytest to the CPU backend (8 virtual devices for
the sharding tests), so by default no test touches the TPU. This module
closes that gap on demand: it spawns a SUBPROCESS with the ambient
(TPU) platform and drives a small facade render through the Pallas plan,
fetching the result to the host (the only reliable completion barrier on
this platform — see .claude/skills/verify/SKILL.md).

Not enabled by default: chip runs must stay sequential (a second TPU
process can wedge the chip) and cold compiles take minutes.
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("VRT_TPU_TESTS") != "1",
    reason="real-chip test; set VRT_TPU_TESTS=1 (runs a TPU subprocess)",
)

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {root!r})
    import jax, os
    os.makedirs({cache!r}, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", {cache!r})
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import numpy as np
    from volume_renderer_tpu import Volume, VolumeRenderer

    assert jax.default_backend() != "cpu", jax.default_backend()
    rng = np.random.RandomState(0)
    em = rng.rand(32, 32, 32).astype(np.float32) * 0.2
    r = VolumeRenderer()
    r.volume_emission = Volume.create(em)
    r.volume_absorption = Volume.create(em * 0.8)
    r.focal_length, r.distance_to_object = 3.0, 6.0
    r.rotate(125, 25, 0)
    r.image_resolution = (64, 64)
    img = np.asarray(r.render())
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    assert r.last_plan.path == "pallas", r.last_plan
    print("TPU_SMOKE_OK", float(img.max()))
""")


def test_chip_render_via_pallas_plan():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the ambient TPU plugin win
    script = _SCRIPT.format(root=root,
                            cache=os.path.join(root, ".jax_cache"))
    out = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=1500, cwd=root,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TPU_SMOKE_OK" in out.stdout
