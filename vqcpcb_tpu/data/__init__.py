"""Host-side data pipeline: tokenization, caching and fixed-shape batch
generation. music21 is an optional dependency confined to the corpus adapters
and score writers; training and CI never touch it."""
