"""End-to-end pipeline compositions (Ray) + the serial oracle."""
