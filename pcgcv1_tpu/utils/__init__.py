"""Utilities: checkpoints, timers, config."""
