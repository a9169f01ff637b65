"""Misc utilities: bidi display reordering, profiling hooks."""
