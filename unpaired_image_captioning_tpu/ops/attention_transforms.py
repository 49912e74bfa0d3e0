"""Attention weight transforms: softmax, sparsemax, and the constrained
(upper-bounded / fertility) variants.

Parity: reference `misc/OpenNMT-py-dalegebit/onmt/modules/activations.py`
(:9-233) and `constrained_sparsemax.py` — there implemented as numpy-based
autograd Functions on host. Here they are pure XLA tensor programs (sort +
cumulative sums), differentiable via `jax.grad` with the same closed-form
Jacobian structure, and batched/jit/TPU-friendly.

All functions take logits `z` [..., N] and an optional 0/1 `mask` over the
last axis, and return a probability(-like) vector on the simplex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e9


def softmax(z, mask=None, upper_bounds=None):
    del upper_bounds
    if mask is not None:
        z = jnp.where(mask > 0, z, NEG)
    return jax.nn.softmax(z, axis=-1)


def _simplex_threshold(z_sorted):
    """tau such that sum(max(z - tau, 0)) = 1 for descending-sorted z."""
    n = z_sorted.shape[-1]
    cssv = jnp.cumsum(z_sorted, axis=-1) - 1.0
    rho_range = jnp.arange(1, n + 1, dtype=z_sorted.dtype)
    cond = z_sorted * rho_range > cssv
    rho = jnp.sum(cond.astype(jnp.int32), axis=-1)
    tau = jnp.take_along_axis(cssv, (rho - 1)[..., None], axis=-1)[..., 0]
    return tau / rho.astype(z_sorted.dtype)


def sparsemax(z, mask=None, upper_bounds=None):
    """Projection of z onto the simplex (Martins & Astudillo 2016).

    Parity: activations.py sparsemax forward (:76-120). Differentiable:
    XLA autodiffs the sort+cumsum composition to the correct sparse Jacobian.
    """
    del upper_bounds
    z = z.astype(jnp.float32)
    if mask is not None:
        z = jnp.where(mask > 0, z, NEG)
    z_sorted = -jnp.sort(-z, axis=-1)
    tau = _simplex_threshold(z_sorted)
    return jnp.maximum(z - tau[..., None], 0.0)


def constrained_softmax(z, mask=None, upper_bounds=None):
    """Softmax with per-element upper bounds u (sum(u) >= 1 assumed).

    Parity: activations.py ConstrainedSoftmaxFunction (:122-170): the
    solution clips a scaled softmax at the bounds; elements at their bound
    are fixed and the rest renormalize. Iterative water-filling with a
    static loop (N small: attention over <=196 slots + sink).
    """
    if upper_bounds is None:
        return softmax(z, mask)
    z = z.astype(jnp.float32)
    if mask is not None:
        z = jnp.where(mask > 0, z, NEG)
    p = jax.nn.softmax(z, axis=-1)
    u = upper_bounds.astype(jnp.float32)

    def body(_, state):
        free, _p = state
        clipped = jnp.where(free, 0.0, u)
        budget = 1.0 - jnp.sum(clipped, axis=-1, keepdims=True)
        mass = jnp.sum(jnp.where(free, p, 0.0), axis=-1, keepdims=True)
        scaled = p * budget / jnp.maximum(mass, 1e-20)
        newp = jnp.where(free, scaled, u)
        new_free = jnp.logical_and(free, scaled < u)
        return new_free, newp

    free0 = jnp.ones_like(p, dtype=bool)
    # log2(N) iterations suffice; bound statically
    import math
    iters = max(4, math.ceil(math.log2(max(z.shape[-1], 2))))
    free, out = jax.lax.fori_loop(0, iters, body, (free0, p))
    return out


def constrained_sparsemax(z, mask=None, upper_bounds=None):
    """Projection onto {p: 0 <= p <= u, sum p = 1}.

    Parity: constrained_sparsemax.py solver. Implemented as bisection on the
    threshold tau: p(tau) = clip(z - tau, 0, u) is monotone in tau.
    """
    if upper_bounds is None:
        return sparsemax(z, mask)
    z = z.astype(jnp.float32)
    if mask is not None:
        z = jnp.where(mask > 0, z, NEG)
    u = upper_bounds.astype(jnp.float32)

    lo = jnp.min(z - u, axis=-1) - 1.0
    hi = jnp.max(z, axis=-1)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.clip(z - mid[..., None], 0.0, u), axis=-1)
        hi = jnp.where(s >= 1.0, hi, mid)
        lo = jnp.where(s >= 1.0, mid, lo)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 50, body, (lo, hi))
    tau = 0.5 * (lo + hi)
    return jnp.clip(z - tau[..., None], 0.0, u)


def matrix_tree_marginals(scores, root_scores):
    """Matrix-Tree-Theorem edge marginals for non-projective dependency
    structured attention.

    Parity: reference `onmt/modules/StructuredAttention.py` (matrix-tree
    layer, Liu & Lapata 2018 / Koo et al. 2007): given edge scores
    [B, N, N] (parent -> child) and root scores [B, N], return the marginal
    probability of each edge under the distribution over spanning trees.
    Pure XLA: one batched linear solve (no host loops).
    """
    b, n, _ = scores.shape
    a = jnp.exp(scores - jnp.max(scores, axis=(-2, -1), keepdims=True))
    a = a * (1.0 - jnp.eye(n))[None]              # no self-edges
    r = jnp.exp(root_scores - jnp.max(root_scores, axis=-1, keepdims=True))
    # Laplacian L[h,m] = -A[h,m] (h!=m), L[m,m] = sum_h A[h,m]; row 0
    # replaced by the root potentials (Koo et al. 2007 construction)
    col_sums = jnp.sum(a, axis=1)                 # [B, N]
    lap = -a + jnp.eye(n)[None] * col_sums[:, None, :]
    lap = lap.at[:, 0, :].set(r)
    binv = jnp.linalg.inv(lap.astype(jnp.float32))  # B = L^-1
    diag_b = jnp.diagonal(binv, axis1=1, axis2=2)   # B[m,m]
    not_first_m = (jnp.arange(n) != 0).astype(jnp.float32)
    not_first_h = not_first_m
    # mu(h,m) = A[h,m] * ( [m!=0] B[m,m] - [h!=0] B[m,h] )
    term1 = a * (diag_b * not_first_m)[:, None, :]
    term2 = a * jnp.swapaxes(binv, 1, 2) * not_first_h[None, :, None]
    marg = term1 - term2
    # mu(root,m) = r[m] * B[m,0]
    root_marg = r * binv[:, :, 0]
    return marg, root_marg


TRANSFORMS = {
    "softmax": softmax,
    "sparsemax": sparsemax,
    "constrained_softmax": constrained_softmax,
    "constrained_sparsemax": constrained_sparsemax,
}
