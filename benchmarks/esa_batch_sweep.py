"""Batch sweep of the PRIMARY bench metric (ESA esa_topk=16).

The ESA pipeline's NAT + LM-rank stages are HBM-bandwidth-bound at the
shipped B=16 (benchmarks/esa_topk_stage_bench.py); RTF divides by batch,
so any MFU gained from a larger batch is a direct RTF win. This sweep
times the SHIPPED nat_decode_jit topk16 config at B in {16, 32, 48}
with bench.py's methodology (device fori_loop, perturbed inputs,
calibrated mid emission profile).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.models.lm import TransformerLM
    from cassnat_asr_public_tpu.utils.config import Config
    from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit

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
    T, umax, S, secs = 736, 96, 50, 7.4
    bmax = 48
    rng = jax.random.PRNGKey(0)
    base_all = jax.random.normal(rng, (bmax, T, 240), jnp.float32)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, 4999),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng},
                        base_all[:1, :64], jnp.ones((1, 64), bool),
                        labels, jnp.full((1,), 20, jnp.int32))
    lm = TransformerLM(4999, n_layers=16, d_model=512, d_ff=2048, n_head=8,
                       dropout=0.0, compute_dtype=jnp.bfloat16)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 8), jnp.int32))

    # mid emission profile calibration (bench.py methodology, condensed)
    m16 = jnp.ones((16, T), bool)
    _, _, c0 = jax.jit(lambda p, f: model.apply(
        p, f, m16, method="encode_ctc"))(params, base_all[:16])
    c0 = np.asarray(c0, np.float32)
    gap = c0[..., 1:].max(-1) - c0[..., 0]
    blank_bias = float(np.quantile(gap, 0.80))
    boosted = c0.copy()
    boosted[..., 0] += blank_bias

    def lowconf_frac(tau):
        z = boosted / tau
        z = z - z.max(-1, keepdims=True)
        return float((1.0 / np.exp(z).sum(-1) < 0.9).mean())

    lo, hi = 1e-3, 10.0
    for _ in range(40):
        mid = (lo * hi) ** 0.5
        if lowconf_frac(mid) > 0.10:
            hi = mid
        else:
            lo = mid
    tau = (lo * hi) ** 0.5
    gen = dict(params["params"]["ctc_generator"]["proj"])
    boost = jnp.zeros((4999,), gen["bias"].dtype).at[0].set(blank_bias)
    gen["kernel"] = gen["kernel"] / tau
    gen["bias"] = (gen["bias"] + boost) / tau
    params["params"]["ctc_generator"]["proj"] = gen
    print(f"calibrated: blank_bias={blank_bias:.3f} tau={tau:.4f}",
          flush=True)

    def lm_apply(p, ys, f, m):
        return lm.apply(p, ys, method="forward_logits")

    for B in (16, 32, 48):
        base = base_all[:B]
        mask = jnp.ones((B, T), bool)

        @jax.jit
        def loop(params, lm_p, base, key):
            def body(i, acc):
                f = base + jax.random.normal(
                    jax.random.fold_in(key, i), base.shape) * 1e-6
                out = nat_decode_jit(
                    model, params, f, mask,
                    jax.random.fold_in(key, 1000 + i), umax=umax,
                    sample_num=S, threshold=0.9, rank_model="lm",
                    lm_apply=lm_apply, lm_params=lm_p,
                    lm_apply_logits=True, esa_topk=16)
                return acc + out["tokens"].sum() + out["lengths"].sum()
            return jax.lax.fori_loop(0, 3, body, jnp.zeros((), jnp.int32))

        t0 = time.time()
        np.asarray(loop(params, lm_params, base, jax.random.PRNGKey(99)))
        print(f"B={B}: compiled in {time.time() - t0:.1f}s", flush=True)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(params, lm_params, base, jax.random.PRNGKey(i)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / 3
        rtf = dt / (B * secs)
        print(f"B={B}: {dt * 1e3:8.2f} ms/iter  rtf={rtf:.2e}  "
              f"vs_baseline={0.011 / rtf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
