"""Mesh/sharding layer: data-parallel batches over ICI with optional tensor
parallelism for the transformer matmuls. A new first-class component — the
reference has no distributed code at all (SURVEY.md §2.5)."""
