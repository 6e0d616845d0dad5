"""Aux subsystems: structured logging, checkpointing, profiling (SURVEY.md §5)."""
