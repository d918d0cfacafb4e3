"""Training infrastructure: jitted train steps, optimizers, checkpoints,
metrics, and the trainer loops mirroring the reference CLI behaviour."""
