"""Device-side ops: fused RNN cells (Pallas), attention transforms,
batched sampling / beam search, device-side CIDEr-D, masking utilities."""
