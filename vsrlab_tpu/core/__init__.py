"""Core runtime: losses, metrics, schedulers, config, checkpointing, logging."""
