"""Auxiliary subsystems: checkpointing, metrics/profiling (SURVEY §5)."""
