"""Checkpoint manifest / resume layer."""
