"""Microbench of NAT-decoder submodules at the ESA decode shapes.

(N=800 candidate rows, U=96 slots, T=184 enc frames, D=512): ConSAD-style
rel self-attention, trigger-masked cross attention, ConvModule, FFN,
generator (+f32 log_softmax over V), and trigger-mask construction — to
locate the NAT stage's gap to its FLOP roofline (~5x as of r2).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_inner=30, reps=3):
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

    from cassnat_asr_public_tpu.nn.modules import (
        ConvModule,
        LayerNorm,
        MultiHeadedAttention,
        PositionwiseFeedForward,
        RelMultiHeadedAttention,
        RelativePositionalEncoding,
        swish,
    )
    from cassnat_asr_public_tpu.ops.ctc import align_to_trigger_mask
    from flax import linen as nn

    N, U, T, D, H, V = 800, 96, 184, 512, 8, 4999
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (N, U, D), dt)
    mem = jax.random.normal(rng, (N, T, D), dt)
    tgt_mask = jnp.ones((N, 1, U), bool)
    trig = jax.random.uniform(rng, (N, U, T)) < 0.1

    relpe = RelativePositionalEncoding(D, 0.0, 8)
    pe_params = relpe.init(rng, x)
    _, pos = relpe.apply(pe_params, x)

    def perturb(key, a):
        return a + jax.random.normal(key, a.shape, a.dtype) * 1e-6

    mods = []
    rel = RelMultiHeadedAttention(H, D, 0.0, compute_dtype=dt)
    rp = rel.init(rng, x, x, x, tgt_mask[:, :1], pos)
    mods.append(("rel self-attn (U) ", lambda k: rel.apply(
        rp, perturb(k, x), x, x, tgt_mask[:, :1], pos)
        .astype(jnp.float32).sum()))

    mha = MultiHeadedAttention(H, D, 0.0, compute_dtype=dt)
    mp = mha.init(rng, x, mem, mem, trig)
    mods.append(("cross-attn (UxT)  ", lambda k: mha.apply(
        mp, perturb(k, x), mem, mem, trig).astype(jnp.float32).sum()))

    conv = ConvModule(D, 3, compute_dtype=dt)
    cp = conv.init(rng, x)
    mods.append(("conv module k=3   ", lambda k: conv.apply(
        cp, perturb(k, x)).astype(jnp.float32).sum()))

    ff = PositionwiseFeedForward(D, 1024, 0.0, activation=swish,
                                 compute_dtype=dt)
    fp = ff.init(rng, x)
    mods.append(("ffn 512->1024     ", lambda k: ff.apply(
        fp, perturb(k, x)).astype(jnp.float32).sum()))

    ln = LayerNorm()
    lp = ln.init(rng, x)
    mods.append(("layernorm         ", lambda k: ln.apply(
        lp, perturb(k, x)).astype(jnp.float32).sum()))

    gen = nn.Dense(V, dtype=dt)
    gp = gen.init(rng, x)
    mods.append(("generator+logsmax ", lambda k: jax.nn.log_softmax(
        gen.apply(gp, perturb(k, x)).astype(jnp.float32), -1).sum()))

    shift = jnp.where(jax.random.uniform(rng, (N, T)) < 0.2,
                      jax.random.randint(rng, (N, T), 3, V), 0)
    fmask = jnp.ones((N, T), bool)
    ylen = (shift != 0).sum(-1)
    mods.append(("trigger-mask build", lambda k: align_to_trigger_mask(
        jnp.where(jax.random.uniform(k, (N, T)) < 1e-9, 1, shift),
        U + 1, fmask, fmask.sum(-1), ylen).astype(jnp.float32).sum()))

    for name, fn in mods:
        print(f"{name}: {timed(fn) * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
