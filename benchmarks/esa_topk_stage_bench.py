"""Stage split of the PRIMARY bench metric (ESA esa_topk=16) + umax scaling.

Isolates per-iteration cost of: encoder, sampling+topk preselect, NAT
decode at (B*K, U), 16L-LM rank at (B*K, U) — for U in {96, 64, 48} and
K in {16, 8} — to locate the next lever toward the >=100x north star.
Same methodology as bench.py (device fori_loop, perturbed inputs).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n_inner=5, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(key, *a):
        def body(i, acc):
            return acc + fn(jax.random.fold_in(key, i), *a)
        return jax.lax.fori_loop(0, n_inner, body, jnp.zeros((), jnp.float32))

    np.asarray(loop(jax.random.PRNGKey(99), *args))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jax.random.PRNGKey(i), *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / n_inner


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.models.lm import TransformerLM
    from cassnat_asr_public_tpu.ops.ctc import ctc_sampled_align
    from cassnat_asr_public_tpu.utils.config import Config

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
    model = make_cassnat(240, args)
    B, S, T = 16, 50, 736
    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (B, T, 240), jnp.float32)
    mask = jnp.ones((B, T), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, 4999),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                        labels, jnp.full((1,), 20, jnp.int32))
    lm = TransformerLM(4999, n_layers=16, d_model=512, d_ff=2048, n_head=8,
                       dropout=0.0, compute_dtype=jnp.bfloat16)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 8), jnp.int32))
    # the shipped primary ranker (4L at the same width, WER-validated —
    # WER_PARITY*.md capacity ladder)
    lm4 = TransformerLM(4999, n_layers=4, d_model=512, d_ff=2048, n_head=8,
                        dropout=0.0, compute_dtype=jnp.bfloat16)
    lm4_params = lm4.init(jax.random.PRNGKey(2), jnp.ones((1, 8), jnp.int32))

    enc_fn = jax.jit(lambda p, f: model.apply(p, f, mask, method="encode_ctc"))
    enc_h, enc_mask, ctc_out = enc_fn(params, base)
    c0 = np.asarray(ctc_out, np.float32)
    gap = c0[..., 1:].max(-1) - c0[..., 0]
    boost = jnp.zeros((4999,), jnp.float32).at[0].set(
        float(np.quantile(gap, 0.90)))  # "mid" emission profile
    ctc_b = ctc_out + boost

    def stage_encoder(key, params, base):
        f = base + jax.random.normal(key, base.shape, jnp.float32) * 1e-6
        h, m, c = model.apply(params, f, mask, method="encode_ctc")
        return h.astype(jnp.float32).sum()

    def make_stage_sample_topk(K):
        def stage(key, ctc_):
            c = ctc_ + jax.random.uniform(key, (), jnp.float32) * 1e-6
            sh, yl, psc = ctc_sampled_align(c, mask[:, ::4][:, :c.shape[1]],
                                            S, threshold=0.9, rng=key,
                                            return_scores=True)
            idx = jax.lax.top_k(psc.reshape(B, S), K)[1]
            flat = (jnp.arange(B)[:, None] * S + idx).reshape(-1)
            return sh[flat].sum().astype(jnp.float32) + yl[flat].sum()
        return stage

    print(f"encoder(B={B},T={T}): "
          f"{timed(stage_encoder, (params, base)) * 1e3:8.2f} ms", flush=True)
    Tp = ctc_out.shape[1]
    print(f"sample+topk16(S=50) : "
          f"{timed(make_stage_sample_topk(16), (ctc_b,)) * 1e3:8.2f} ms",
          flush=True)

    for K in (16, 8):
        N = B * K
        rep = lambda x: jnp.repeat(x, K, axis=0)
        enc_r = rep(enc_h)
        mask_r = rep(enc_mask)
        for U in (96, 64, 48):
            # frame-level alignment with ~36 token marks per row (mean
            # ylen of the trained parity model), capped below U
            marks = jax.random.uniform(rng, (N, Tp)) < (36.0 / Tp)
            cum = jnp.cumsum(marks, axis=1)
            marks = marks & (cum <= U - 2)
            shift = jnp.where(marks,
                              jax.random.randint(rng, (N, Tp), 3, 4999), 0)
            yl = (shift != 0).sum(-1)
            toks = jax.random.randint(rng, (N, U), 3, 4999)

            def stage_nat(key, params, enc_r_, shift_, ylen_):
                h = enc_r_ + jax.random.normal(key, enc_r_.shape,
                                               enc_r_.dtype) * 1e-6
                att, yl_ = model.apply(params, h, mask_r, shift_, ylen_, U,
                                       method="nat_decode",
                                       return_logits=True)
                return att.astype(jnp.float32).sum() + yl_.sum()

            def make_stage_lm(m):
                def stage_lm(key, lm_params, toks_):
                    t = jnp.where(jax.random.uniform(key, toks_.shape) < 1e-6,
                                  3, toks_)
                    out = m.apply(lm_params, t, method="forward_logits")
                    return out.astype(jnp.float32).sum()
                return stage_lm

            tn = timed(stage_nat, (params, enc_r, shift, yl)) * 1e3
            tl = timed(make_stage_lm(lm), (lm_params, toks)) * 1e3
            tl4 = timed(make_stage_lm(lm4), (lm4_params, toks)) * 1e3
            print(f"K={K:2d} U={U:2d}  NAT(N={N:3d}): {tn:8.2f} ms   "
                  f"LM16: {tl:8.2f} ms   LM4: {tl4:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
