"""Stage-split profiling of the NAST decode pipeline on one TPU chip.

Times each stage of the bench.py pipeline (frontend / encoder / ctc head /
alignment / NAT decoder) and sub-splits the ConvEmbedding frontend
(conv1 / conv2 / linear_out) with the honest device-loop methodology
(fresh perturbed inputs inside a jitted fori_loop; see bench.py).

Usage: python benchmarks/stage_bench.py [--batch 32] [--frames 736]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_inner=10, reps=3):
    import jax

    @jax.jit
    def loop(key, *a):
        def body(i, acc):
            out = fn(jax.random.fold_in(key, i), *a)
            return acc + out
        return jax.lax.fori_loop(0, n_inner, body, jax.numpy.zeros((), jax.numpy.float32))

    np.asarray(loop(jax.random.PRNGKey(99), *args))  # compile+warm
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jax.random.PRNGKey(i), *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_inner


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.ops.ctc import ctc_best_path_align
    from cassnat_asr_public_tpu.utils.config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=736)
    ap.add_argument("--umax", type=int, default=192)
    A = ap.parse_args()

    args = Config(
        vocab_size=4999, N_enc=12, N_extra=1, N_self_dec=5, N_mix_dec=2,
        d_model=512, d_ff=2048, d_encff=1024, d_decff=1024, n_head=8,
        dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
        label_smooth=0.1, padding_idx=0, use_conv_enc=True, use_conv_dec=True,
        enc_kernel_size=31, dec_kernel_size=3, enc_max_relative_len=20,
        dec_max_relative_len=8, pos_type="relative", share_ff=False,
        use_trigger=True, src_trigger=False, use_unimask=False,
        use_best_path=True, compute_dtype=jnp.bfloat16,
    )
    input_size = 240
    model = make_cassnat(input_size, args)

    B, T, U = A.batch, A.frames, A.umax
    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (B, T, input_size), jnp.float32)
    mask = jnp.ones((B, T), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, 4999),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                        labels, jnp.full((1,), 20, jnp.int32))

    # precompute stage inputs once
    (emb, pos), emb_mask = model.apply(params, base, mask,
                                       method=lambda m, x, msk: m.src_embed(x, msk))
    enc_h, enc_mask, ctc_out = model.apply(params, base, mask,
                                           method="encode_ctc")
    shift, ylen0 = ctc_best_path_align(ctc_out, enc_mask)

    def full(key, params, base):
        f = base + jax.random.normal(key, base.shape) * 1e-6
        eh, em, co = model.apply(params, f, mask, method="encode_ctc")
        sh, y0 = ctc_best_path_align(co, em)
        att, ylen = model.apply(params, eh, em, sh, y0, U,
                                method="nat_decode")
        return att.argmax(-1).sum().astype(jnp.float32)

    def frontend(key, params, base):
        f = base + jax.random.normal(key, base.shape) * 1e-6
        (e, p), m2 = model.apply(params, f, mask,
                                 method=lambda m, x, msk: m.src_embed(x, msk))
        return e.astype(jnp.float32).sum()

    def encoder_only(key, params, emb, pos, emb_mask):
        e = emb + jax.random.normal(key, emb.shape, emb.dtype) * 1e-6
        h, _ = model.apply(
            params, (e, pos), emb_mask[:, None, :],
            method=lambda m, x, msk: m.encoder(x, msk))
        return h.astype(jnp.float32).sum()

    def ctc_head(key, params, enc_h):
        e = enc_h + jax.random.normal(key, enc_h.shape, enc_h.dtype) * 1e-6
        return model.apply(params, e,
                           method=lambda m, x: m.ctc_generator(x)).sum()

    def align_only(key, ctc_out):
        c = ctc_out + jax.random.normal(key, ctc_out.shape) * 1e-6
        sh, y0 = ctc_best_path_align(c, enc_mask)
        return (sh.sum() + y0.sum()).astype(jnp.float32)

    def nat_only(key, params, enc_h):
        e = enc_h + jax.random.normal(key, enc_h.shape, enc_h.dtype) * 1e-6
        att, ylen = model.apply(params, e, enc_mask, shift, ylen0, U,
                                method="nat_decode")
        return att.argmax(-1).sum().astype(jnp.float32)

    stages = {
        "full": (full, (params, base)),
        "frontend(src_embed)": (frontend, (params, base)),
        "encoder": (encoder_only, (params, emb, pos, emb_mask)),
        "ctc_head": (ctc_head, (params, enc_h)),
        "align(best_path)": (align_only, (ctc_out,)),
        "nat_decode": (nat_only, (params, enc_h)),
    }
    audio_s = B * (T / 100.0)
    for name, (fn, a) in stages.items():
        dt = timed(fn, *a)
        print(f"{name:22s} {dt*1e3:8.2f} ms   rtf={dt/audio_s:.3e}")


if __name__ == "__main__":
    main()
