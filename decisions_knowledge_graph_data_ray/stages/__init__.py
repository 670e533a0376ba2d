"""Ray Data stage implementations."""
