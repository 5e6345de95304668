"""Runtime utilities: config, structured logging, checkpointing."""
