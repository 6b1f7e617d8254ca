"""Multi-chip sharding: image-tile data parallelism and voxel-brick sharding.

The production multi-chip engines (the reference is single-GPU,
src/C/vr/volumeRender.cpp:77-87):

- ``pallas_dp``: rays-DP with the Pallas kernel per shard —
  ``render_forward_fast_sharded`` / ``train_step_fast_sharded``.
- ``bricks``: voxel z-brick sharding with the two-phase transmittance
  relay — ``render_forward_bricked_fast`` / ``voxel_grads_bricked_fast``
  / ``train_step_fast_bricked`` (kernel-backed), plus the XLA
  ``render_forward_bricked`` / ``render_fused_bricked`` fallbacks.
- ``sharding``: the XLA rays-DP tier (``render_forward_sharded``).
- ``multihost``: ``jax.distributed`` process-spanning mesh rehearsal.
"""

from volume_renderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    render_forward_sharded,
)
