"""Multi-host rehearsal: 2 local CPU processes via jax.distributed.

Each worker owns one virtual device; the training step runs over the
process-spanning mesh with psum'd gradients, and every process computes
the same global loss (checked inside run_demo).
"""

import pytest
from volume_renderer_tpu.parallel.multihost import run_demo

pytestmark = pytest.mark.slow  # interpret-mode kernel sweeps


def test_two_process_training_step():
    loss = run_demo(num_processes=2, port=12967)
    assert loss >= 0.0
