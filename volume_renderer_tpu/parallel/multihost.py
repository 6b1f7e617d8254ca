"""Multi-host scaffolding: jax.distributed + process-spanning meshes.

The reference is single-process, single-GPU (SURVEY.md §2 parallelism
table: no NCCL/MPI anywhere). Here the distributed backend is JAX's:
``jax.distributed.initialize`` connects N processes (one per TPU host)
into one global device namespace; meshes built from ``jax.devices()``
then span every host, and the same ``shard_map`` render/train code runs
unchanged — collectives ride ICI within a slice and DCN across slices.

Rehearsable without TPU hardware: launch N local CPU processes
(``python -m volume_renderer_tpu.parallel.multihost --demo``), each
pinned to one virtual CPU device, all joined through a local
coordinator. The demo runs a rays-DP training step over the
process-spanning mesh and checks the loss against a single-process run.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_DOC = """Environment for a real multi-host TPU pod slice:
each host runs the same program; JAX auto-detects coordinator/process
ids from the TPU metadata, so ``initialize()`` needs no arguments.
For manual clusters set coordinator_address/num_processes/process_id."""


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join this process into a multi-host JAX cluster.

    On TPU pods all arguments are auto-detected (call with none). After
    this returns, ``jax.devices()`` lists every chip in the cluster and
    ``jax.local_devices()`` this host's chips; build meshes from the
    global list and the rest of the package works unchanged.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = "rays"):
    """1-D mesh over every device in the cluster (all hosts)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


# ---------------------------------------------------------------------------
# local multi-process rehearsal (CPU)
# ---------------------------------------------------------------------------


def _demo_worker(process_id: int, num_processes: int, port: int) -> float:
    """One rehearsal process: 1 CPU device, joins the local cluster, runs a
    sharded training step on the process-spanning mesh; returns the loss."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.device_count() == num_processes, (
        jax.device_count(), num_processes)

    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_scene
    from volume_renderer_tpu import train
    from volume_renderer_tpu.ops.forward import render_forward
    from volume_renderer_tpu.parallel.multihost import global_mesh

    scene = _flagship_scene(vol=12, lighting=True)
    opts = scene.options(16, 8 * num_processes)
    target = render_forward(scene, opts)

    params, static_scene = train.split_params(scene)
    params = dict(params)
    params["emission"] = params["emission"] * 1.2 + 0.05
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    mesh = global_mesh()
    params, opt_state, loss = train.train_step_sharded(
        params, opt_state, static_scene, opts, jnp.asarray(target), optimizer,
        mesh=mesh,
    )
    jax.block_until_ready(params)
    return float(loss)


def run_demo(num_processes: int = 2, port: int = 12921) -> float:
    """Drive the N-process rehearsal from one parent; returns process 0's
    loss after checking every process agreed (psum-consistent)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(num_processes) as pool:
        losses = pool.starmap(
            _demo_worker,
            [(i, num_processes, port) for i in range(num_processes)],
        )
    assert all(abs(l - losses[0]) < 1e-9 for l in losses), losses
    return losses[0]


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--demo", action="store_true",
                    help="run the local 2-process CPU rehearsal")
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()
    if args.demo:
        loss = run_demo(args.num_processes)
        print(f"multihost demo ({args.num_processes} processes): "
              f"loss={loss:.6f} OK")
    else:
        print(_ENV_DOC)
