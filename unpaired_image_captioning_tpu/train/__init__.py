"""Training driver: dual optimizer, checkpointing, joint i2t+NMT trainer."""
