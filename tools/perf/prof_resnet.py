"""ResNet-101 feature-extraction throughput on real TPU (the prepro_feats
front-end: 448x448 images -> fc 2048 + 14x14x2048 att grid)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from unpaired_image_captioning_tpu.models.resnet import ResNet

B, HW = 16, 448


def main():
    net = ResNet("resnet101")
    params = net.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)
    rng = np.random.RandomState(0)
    resident, iters = 4, 24
    imgs = jnp.asarray(rng.rand(resident, B, HW, HW, 3), dtype)

    @jax.jit
    def sweep(params, imgs):
        def body(_, i):
            im = jax.lax.dynamic_index_in_dim(imgs, i % resident,
                                              keepdims=False)
            fc, att = net.my_resnet(params, im, att_size=14)
            return None, (jnp.sum(fc, dtype=jnp.float32),
                          jnp.sum(att, dtype=jnp.float32))
        _, outs = jax.lax.scan(body, None, jnp.arange(iters))
        return outs

    _ = jax.tree.map(np.asarray, sweep(params, imgs))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, sweep(params, imgs))
        best = min(best, time.perf_counter() - t0)
    print(f"resnet101 448px features: {B*iters/best:.1f} images/s "
          f"({best*1e3/(B*iters):.2f} ms/image)")


if __name__ == "__main__":
    main()
