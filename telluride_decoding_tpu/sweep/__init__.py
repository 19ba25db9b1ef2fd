"""Mesh-parallel parameter sweeps (lambda grids, jackknife)."""

from telluride_decoding_tpu.sweep.engine import (
    SweepResult,
    cca_jackknife_sweep,
    default_mesh,
    pad_and_stack,
    ridge_jackknife_sweep,
)
from telluride_decoding_tpu.sweep.checkpoint import (
    SweepCheckpoint,
    run_sweep_with_checkpoints,
)
