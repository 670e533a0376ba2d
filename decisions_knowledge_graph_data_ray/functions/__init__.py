"""Pure deterministic functions shared by Ray stages and the serial oracle."""
