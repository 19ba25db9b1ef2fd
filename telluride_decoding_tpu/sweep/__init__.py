"""Mesh-parallel parameter sweeps (lambda grids, jackknife)."""

from telluride_decoding_tpu.sweep.engine import (
    ContextSpec,
    SweepResult,
    cca_jackknife_sweep,
    cohort_summary,
    default_mesh,
    multi_subject_sweep,
    pad_and_stack,
    per_file_stats,
    ridge_jackknife_sweep,
)
from telluride_decoding_tpu.sweep.checkpoint import (
    SweepCheckpoint,
    run_sweep_with_checkpoints,
)
