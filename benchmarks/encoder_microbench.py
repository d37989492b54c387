"""Microbench of conformer-encoder submodules at production decode shapes.

Isolates RelMHA vs plain MHA, ConvModule, FFN, LayerNorm at (B=32, T=184,
D=512) to find where the encoder's gap to the FLOP roofline comes from.
"""

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
    from flax import linen as nn

    from cassnat_asr_public_tpu.nn.modules import (
        ConvModule,
        LayerNorm,
        MultiHeadedAttention,
        PositionwiseFeedForward,
        RelMultiHeadedAttention,
        RelativePositionalEncoding,
        swish,
    )

    B, T, D, H, DF = 32, 184, 512, 8, 1024
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, D), dt)
    mask = jnp.ones((B, 1, T), bool)

    relpe = RelativePositionalEncoding(D, 0.0, 20)
    pe_params = relpe.init(rng, x)
    _, pos = relpe.apply(pe_params, x)

    def perturb(key, a):
        # key-dependent input so XLA cannot hoist the body out of the loop
        return a + (jax.random.uniform(key, (), a.dtype) * 1e-6)

    mods = {}
    rel = RelMultiHeadedAttention(H, D, 0.0, compute_dtype=dt)
    p_rel = rel.init(rng, x, x, x, mask, pos)
    mods["rel_mha"] = (lambda k, p, a, m, pe_:
                       rel.apply(p, perturb(k, a), a, a, m, pe_)
                       .astype(jnp.float32).sum(), (p_rel, x, mask, pos))

    mha = MultiHeadedAttention(H, D, 0.0, compute_dtype=dt)
    p_mha = mha.init(rng, x, x, x, mask)
    mods["plain_mha"] = (lambda k, p, a, m:
                         mha.apply(p, perturb(k, a), a, a, m)
                         .astype(jnp.float32).sum(), (p_mha, x, mask))

    conv = ConvModule(D, 31, compute_dtype=dt)
    p_conv = conv.init(rng, x)
    mods["conv_module_k31"] = (lambda k, p, a: conv.apply(p, perturb(k, a))
                               .astype(jnp.float32).sum(), (p_conv, x))

    ff = PositionwiseFeedForward(D, DF, 0.0, activation=swish,
                                 compute_dtype=dt)
    p_ff = ff.init(rng, x)
    mods["ffn_1024"] = (lambda k, p, a: ff.apply(p, perturb(k, a))
                        .astype(jnp.float32).sum(), (p_ff, x))

    ln = LayerNorm()
    p_ln = ln.init(rng, x)
    mods["layernorm_ref"] = (lambda k, p, a: ln.apply(p, perturb(k, a))
                             .astype(jnp.float32).sum(), (p_ln, x))

    ln2 = nn.LayerNorm()
    p_ln2 = ln2.init(rng, x)
    mods["layernorm_flax"] = (lambda k, p, a: ln2.apply(p, perturb(k, a))
                              .astype(jnp.float32).sum(), (p_ln2, x))

    for name, (fn, args) in mods.items():
        dt_s = timed(fn, *args)
        print(f"{name:18s} {dt_s*1e3:7.3f} ms  x12={dt_s*12e3:7.2f} ms")


if __name__ == "__main__":
    main()
