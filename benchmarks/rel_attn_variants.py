"""A/B of relative-attention formulations at decode shapes (B32 T184 D512).

All variants compute the same mathematical result as the reference
Transformer-XL attention with CLAMPED relative offsets (the table has only
2R+1 distinct rows, R=20):

  A wide      — reference formulation: (B,H,T,2T-1) scores_bd + pad-reshape
                rel_shift (what nn/modules.py ships today)
  B gather    — compact (B,H,T,2R+1) scores + Toeplitz take_along_axis
  C onehot    — compact scores + one-hot matmul expansion (bias = small @ E)
  D wide_bf16 — A with the bd path in bf16

Parity is asserted against A before timing.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_inner=100, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(key, *a):
        def body(i, acc):
            return acc + fn(jax.random.fold_in(key, i), *a)
        return jax.lax.fori_loop(0, n_inner, body, jnp.zeros((), jnp.float32))

    np.asarray(loop(jax.random.PRNGKey(99), *args))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jax.random.PRNGKey(i), *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_inner


def main():
    import jax
    import jax.numpy as jnp

    B, T, D, H, R = 32, 184, 512, 8, 20
    dk = D // H
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    q_u = jax.random.normal(ks[0], (B, H, T, dk), dt)
    q_v = jax.random.normal(ks[1], (B, H, T, dk), dt)
    k = jax.random.normal(ks[2], (B, H, T, dk), dt)
    v = jax.random.normal(ks[3], (B, H, T, dk), dt)
    # p_wide: (2T-1, H, dk) from the clamped table; p_small: (2R+1, H, dk)
    p_small = jax.random.normal(ks[4], (2 * R + 1, H, dk), dt)
    rel = jnp.arange(-(T - 1), T)
    idx_wide = jnp.clip(rel, -R, R) + R
    p_wide = p_small[idx_wide]
    scale = 1.0 / math.sqrt(dk)

    def rel_shift(bd):
        b, h, t, l = bd.shape
        pad = jnp.zeros((b, h, t, 1), bd.dtype)
        padded = jnp.concatenate([pad, bd], axis=-1)
        padded = padded.reshape(b, h, l + 1, t)
        return padded[:, :, 1:].reshape(b, h, t, l)[:, :, :, :t]

    def softmax_apply(scores):
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.float32).sum()

    def variant_a(key, q_u, q_v):
        qv = q_v + jax.random.uniform(key, (), dt) * 1e-6
        ac = jnp.einsum("bhqd,khd->bhqk", q_u, k.transpose(2, 0, 1)
                        if False else k.transpose(2, 1, 3, 0)[..., 0]
                        if False else k.transpose(0, 1, 2, 3),
                        preferred_element_type=jnp.float32) \
            if False else jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                                     preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,khd->bhqk", qv, p_wide,
                        preferred_element_type=jnp.float32)
        scores = (ac + rel_shift(bd)) * scale
        return softmax_apply(scores)

    def variant_b(key, q_u, q_v):
        qv = q_v + jax.random.uniform(key, (), dt) * 1e-6
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        small = jnp.einsum("bhqd,ohd->bhqo", qv, p_small,
                           preferred_element_type=jnp.float32)
        off = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None],
                       -R, R) + R                     # (T, T)
        bias = jnp.take_along_axis(
            small, jnp.broadcast_to(off[None, None], (B, H, T, T)), axis=-1)
        return softmax_apply((ac + bias) * scale)

    def variant_c(key, q_u, q_v):
        qv = q_v + jax.random.uniform(key, (), dt) * 1e-6
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        small = jnp.einsum("bhqd,ohd->bhqo", qv, p_small,
                           preferred_element_type=jnp.float32)
        off = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None],
                       -R, R) + R
        E = jax.nn.one_hot(off, 2 * R + 1, dtype=dt)   # (T, T, 2R+1)
        bias = jnp.einsum("bhqo,qko->bhqk", small.astype(dt), E,
                          preferred_element_type=jnp.float32)
        return softmax_apply((ac + bias) * scale)

    def variant_d(key, q_u, q_v):
        qv = q_v + jax.random.uniform(key, (), dt) * 1e-6
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,khd->bhqk", qv, p_wide,
                        preferred_element_type=dt)
        scores = ac + rel_shift(bd).astype(jnp.float32)
        return softmax_apply(scores * scale)

    # parity check (values, not timing)
    outs = {}
    for name, fn in [("A", variant_a), ("B", variant_b), ("C", variant_c),
                     ("D", variant_d)]:
        outs[name] = float(fn(jax.random.PRNGKey(0), q_u, q_v))
    for name in "BCD":
        rel_err = abs(outs[name] - outs["A"]) / (abs(outs["A"]) + 1e-9)
        print(f"parity {name} vs A: rel_err={rel_err:.2e}")

    # NOTE: variant B (broadcasted take_along_axis over (B,H,T,T) indices)
    # crashed the TPU worker — excluded from timing.
    for name, fn in [("A_wide", variant_a),
                     ("C_onehot", variant_c), ("D_wide_bf16", variant_d)]:
        dt_s = timed(fn, q_u, q_v)
        print(f"{name:12s} {dt_s*1e3:7.3f} ms  x12={dt_s*12e3:7.2f} ms")


if __name__ == "__main__":
    main()
