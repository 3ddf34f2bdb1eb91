"""Auxiliary subsystems: profiling, checkpointing, metrics."""
