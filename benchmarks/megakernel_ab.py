"""A/B: fused conformer-layer Pallas megakernel vs the XLA encoder, at the
production greedy-decode shapes of bench.py (B=32, 7.36 s utts, d512 12L
conformer CASS-NAT), end-to-end through the shipped `nat_decode_jit`
(greedy best-path) — per CLAUDE.md, only the end-to-end number decides.

Run on the real TPU:  python benchmarks/megakernel_ab.py
Env: CASSNAT_AB_BATCH (default 32), CASSNAT_AB_SMOKE=1 for a CPU plumbing
check.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.kernels.conformer_layer import fused_encode_ctc
    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.utils.config import Config
    from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit

    smoke = bool(int(os.environ.get("CASSNAT_AB_SMOKE", "0")))
    d = dict(
        vocab_size=4999, N_enc=12, N_extra=1, N_self_dec=5, N_mix_dec=2,
        d_model=512, d_ff=2048, d_encff=1024, d_decff=1024, n_head=8,
        dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
        label_smooth=0.1, padding_idx=0, use_conv_enc=True, use_conv_dec=True,
        enc_kernel_size=31, dec_kernel_size=3, enc_max_relative_len=20,
        dec_max_relative_len=8, pos_type="relative", share_ff=False,
        use_trigger=True, src_trigger=False, use_unimask=False,
        use_best_path=True, compute_dtype=jnp.bfloat16,
    )
    if smoke:
        d.update(vocab_size=128, N_enc=2, N_self_dec=1, N_mix_dec=1,
                 d_model=64, d_ff=128, d_encff=128, d_decff=128, n_head=4,
                 enc_kernel_size=7, enc_max_relative_len=8)
    args = Config(**d)
    input_size = 240
    model = make_cassnat(input_size, args)

    batch = int(os.environ.get("CASSNAT_AB_BATCH", "4" if smoke else "32"))
    frames = 64 if smoke else 736
    umax = 16 if smoke else 96
    n_inner = 2 if smoke else 20

    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (batch, frames, input_size), jnp.float32)
    mask = jnp.ones((batch, frames), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, args.vocab_size),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                        labels, jnp.full((1,), 20, jnp.int32))

    # numeric sanity on-device first (bf16 tolerance)
    e1, m1, c1 = jax.jit(lambda p, f: model.apply(
        p, f, mask, method="encode_ctc"))(params, base)
    e2, m2, c2 = jax.jit(lambda p, f: fused_encode_ctc(
        model, p, f, mask))(params, base)
    rel = float(jnp.abs(e1.astype(jnp.float32) - e2.astype(jnp.float32)).max()
                / (jnp.abs(e1.astype(jnp.float32)).max() + 1e-9))
    relc = float(jnp.abs(c1 - c2).max() / (jnp.abs(c1).max() + 1e-9))
    print(f"[ab] fused-vs-xla rel err: enc {rel:.2e} ctc {relc:.2e}",
          file=sys.stderr, flush=True)

    def make_loop(fused: bool):
        @jax.jit
        def loop(params, base, key):
            def body(i, acc):
                f = base + jax.random.normal(
                    jax.random.fold_in(key, i), base.shape) * 1e-6
                out = nat_decode_jit(model, params, f, mask,
                                     jax.random.fold_in(key, 500 + i),
                                     umax=umax, use_megakernel=fused)
                return acc + out["tokens"].sum() + out["lengths"].sum()
            return jax.lax.fori_loop(0, n_inner, body,
                                     jnp.zeros((), jnp.int32))
        return loop

    def timeit(loop):
        np.asarray(loop(params, base, jax.random.PRNGKey(99)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(params, base, jax.random.PRNGKey(i)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / n_inner

    t_xla = timeit(make_loop(False))
    print(f"[ab] greedy xla-encoder {t_xla * 1e3:.2f} ms/iter",
          file=sys.stderr, flush=True)
    t_fused = timeit(make_loop(True))
    print(f"[ab] greedy fused-encoder {t_fused * 1e3:.2f} ms/iter",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "greedy_xla_ms": round(t_xla * 1e3, 3),
        "greedy_fused_ms": round(t_fused * 1e3, 3),
        "fused_speedup": round(t_xla / t_fused, 3),
        "enc_rel_err": rel, "ctc_rel_err": relc,
        "batch": batch, "frames": frames,
    }))


if __name__ == "__main__":
    main()
