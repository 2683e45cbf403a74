"""Utilities: config loading, persistence, logging/profiling."""
