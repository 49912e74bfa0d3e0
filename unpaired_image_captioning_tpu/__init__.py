"""TPU-native unpaired image captioning framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the ECCV'18
"Unpaired Image Captioning by Language Pivoting" reference stack
(gujiuxiang/unpaired_image_captioning): image -> Chinese captioner families
(FC / attention-LSTM / transformer / stackcap), a Chinese -> English
OpenNMT-style seq2seq translator, the language-pivot coupling (joint-vocab
embedding-alignment losses, pivoted inference), SCST/CIDEr reinforcement
fine-tuning, batched diverse beam search, ensemble decoding, data pipeline,
and the COCO/AIC caption metric stacks.

Everything on the compute path is functional JAX: models are (init, apply)
pairs over parameter pytrees, decode loops are `lax.scan`, beam search is a
single `[batch, beam]` tensor program, and scale-out is `jax.sharding.Mesh`
+ `jit` with sharding annotations (the reference's `torch.nn.DataParallel`,
trainer.py:74, has no translation here by design).
"""

__version__ = "0.1.0"
