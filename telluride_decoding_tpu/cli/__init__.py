"""Command-line drivers with the reference-compatible flag surfaces."""
