"""A/B: fused training MHA (ops/mha_train.py) on the caption transformer's
DECODER sublayers — keep or reject at small tiles.

Round-5 context: with the encoder stack subsumed by the fused whole-layer
kernel (ops/layer_train.py), mha_train now only serves the decoder's
self-attention (17x17) and cross-attention (17x196) under training. The
NMT-transformer A/B (tools/perf/prof_train_nmt_transformer.py) measured
pure XLA 1.21x FASTER than mha_train at that model's tiny tiles (17x16 /
16x16), so the same question must be asked of the caption decoder: does
the kernel still pay for itself once the encoder no longer rides it?

Arms at the protocol XE step (6L d512, batch 50/400, encoder kernel ON in
both): TRAIN_MHA_KERNEL True vs False.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/perf/ab_dec_mha.py [batches...]   (default: 50 400)
"""
import sys

import jax

import unpaired_image_captioning_tpu.models.transformer as tf_mod
from ab_dec_layer import measure


def main():
    batches = [int(a) for a in sys.argv[1:]] or [50, 400]
    print(f"backend={jax.default_backend()}")
    for B in batches:
        for arm in (True, False):
            tf_mod.TRAIN_MHA_KERNEL = arm
            tps = measure(B, dec_kernel=False)
            name = "dec-mha ON " if arm else "dec-mha OFF"
            print(f"batch {B:4d}  {name}: {tps:9.0f} tokens/s", flush=True)


if __name__ == "__main__":
    main()
