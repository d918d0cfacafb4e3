"""TPU-first compute ops: pure functions and flax modules for the hot paths."""
