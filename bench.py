"""Benchmark: NAST (CASS-NAT) batched single-pass decode RTF on one chip.

The reference's headline NAST number is RTF 0.011 (decode compute time /
audio duration) at batch_size 1 on GPU (reference: README.md:33; BASELINE.md).
Here the full pipeline — encoder, CTC head, best-path alignment, trigger
mask, NAT decoder, argmax — runs as one jitted batched function in bfloat16
on the TPU MXU. Synthetic utterances at the LibriSpeech test-clean mean
duration (~7.4 s -> 736 fbank frames at 10 ms) and the production model
config (conf/cassnat_train.yaml: conformer 12-enc d512, 1-extra 5-SAD 2-MAD
conv decoder, 240-dim spliced features).

Methodology: N decode iterations run INSIDE one jitted `lax.fori_loop`, each
iteration on freshly perturbed inputs (fold_in'd keys), with the result
reduced and materialized on host. This measures steady-state device
throughput and defeats any dispatch/result caching; host-tunnel latency
(~25 ms/call in this harness) is amortized out, as it would be in a real
serving loop.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

T0 = time.time()


def note(msg):
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the ESA-config graph is large; cache it
    # so repeated driver runs skip the multi-minute compile.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.nn.modules import enable_flash_attention
    from cassnat_asr_public_tpu.ops.ctc import (ctc_best_path_align,
                                                ctc_sampled_align)
    from cassnat_asr_public_tpu.utils.config import Config

    # A/B on-chip measured XLA's fused attention marginally faster than the
    # Pallas kernel inside this full graph at ASR shapes; the kernel remains
    # available via enable_flash_attention(True).
    enable_flash_attention(False)

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
    input_size = 240  # 80 fbank x 3-frame splice (conf/transformer.yaml)
    model = make_cassnat(input_size, args)

    import os
    batch = int(os.environ.get("CASSNAT_BENCH_BATCH", "32"))
    secs = 7.4               # LibriSpeech test-clean mean utterance length
    frames = 736             # 7.36 s at 10 ms frame shift
    umax = 96                # output-slot budget: test-clean averages ~35
    # BPE tokens per utterance (~0.2 per subsampled frame); 96 slots is
    # >2x the 99.9th-percentile length at these durations.
    n_inner = 20             # decode iterations per dispatch

    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (batch, frames, input_size), jnp.float32)
    mask = jnp.ones((batch, frames), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, 4999),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                        labels, jnp.full((1,), 20, jnp.int32))

    # An untrained CTC head on random input emits a token nearly every
    # frame (ylen ~ T'), which over-weights the NAT/ranking stages ~4x vs
    # real speech, where trained CTC outputs are blank-dominated (~0.2
    # emissions per subsampled frame on test-clean). Calibrate a constant
    # blank-logit boost so argmax picks blank on ~80% of frames — the
    # compute graph is unchanged except one broadcast add.
    _, m0, c0 = jax.jit(lambda p, f: model.apply(
        p, f, mask, method="encode_ctc"))(params, base)
    c0 = np.asarray(c0, np.float32)
    gap = c0[..., 1:].max(-1) - c0[..., 0]
    blank_bias = float(np.quantile(gap, 0.80))
    boost = jnp.zeros((4999,), jnp.float32).at[0].set(blank_bias)
    bp = np.where(gap > blank_bias, c0[..., 1:].argmax(-1) + 1, 0)
    emits = (bp[:, 1:] != bp[:, :-1]) & (bp[:, 1:] != 0)
    note(f"blank_bias={blank_bias:.3f} mean_ylen="
         f"{float(emits.sum(-1).mean()):.1f} of {umax} slots")

    @jax.jit
    def loop_decode(params, base, key):
        def body(i, acc):
            f = base + jax.random.normal(
                jax.random.fold_in(key, i), base.shape) * 1e-6
            enc_h, enc_mask, ctc_out = model.apply(
                params, f, mask, method="encode_ctc")
            ctc_out = ctc_out + boost
            shift, ylen0 = ctc_best_path_align(ctc_out, enc_mask)
            att_out, ylen = model.apply(params, enc_h, enc_mask, shift,
                                        ylen0, umax, method="nat_decode")
            toks = att_out.argmax(-1)
            return acc + toks.sum() + ylen.sum()
        return jax.lax.fori_loop(0, n_inner, body, jnp.zeros((), jnp.int32))

    # compile + warmup
    note("compiling NAST decode loop")
    np.asarray(loop_decode(params, base, jax.random.PRNGKey(99)))
    note("NAST decode compiled")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(loop_decode(params, base, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_inner

    audio_seconds = batch * secs
    rtf = dt / audio_seconds
    baseline_rtf = 0.011  # reference README.md:33

    # ---- ESA parity config (the WER-bearing decode):
    # sample_num=50 sampled alignments + 16-layer transformer-LM ranking
    # (reference: egs/librispeech/conf/cassnat_decode.yaml:36-56 + lm.yaml;
    # reference cassnat.py:441-573). Smaller utterance batch: the decoder
    # batch is batch*sample_num.
    from cassnat_asr_public_tpu.models.lm import TransformerLM

    esa_batch, sample_num = 16, 50
    lm = TransformerLM(4999, n_layers=16, d_model=512, d_ff=2048, n_head=8,
                       dropout=0.0, compute_dtype=jnp.bfloat16)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 8), jnp.int32))
    base_esa = base[:esa_batch]
    mask_esa = mask[:esa_batch]

    def make_esa_loop(topk):
        # topk=0: the reference-parity config (all 50 candidates ranked).
        # topk>0: TPU-native CTC-path-score preselection (nat_decode_jit
        # esa_topk) — NAT + LM rank run on topk candidates only.
        n_cand = topk or sample_num

        @jax.jit
        def loop_esa(params, lm_params, base, key):
            def body(i, acc):
                f = base + jax.random.normal(
                    jax.random.fold_in(key, i), base.shape) * 1e-6
                enc_h, enc_mask, ctc_out = model.apply(
                    params, f, mask_esa, method="encode_ctc")
                ctc_out = ctc_out + boost
                krng = jax.random.fold_in(key, 1000 + i)
                if topk:
                    shift, ylen0, psc = ctc_sampled_align(
                        ctc_out, enc_mask, sample_num, threshold=0.9,
                        rng=krng, return_scores=True)
                    idx = jax.lax.top_k(
                        psc.reshape(esa_batch, sample_num), topk)[1]
                    flat = (jnp.arange(esa_batch)[:, None] * sample_num
                            + idx).reshape(-1)
                    shift, ylen0 = shift[flat], ylen0[flat]
                else:
                    shift, ylen0 = ctc_sampled_align(
                        ctc_out, enc_mask, sample_num, threshold=0.9,
                        rng=krng)
                rep = lambda x: jnp.repeat(x, n_cand, axis=0)
                enc_r, mask_r = rep(enc_h), rep(enc_mask)
                att_out, ylen = model.apply(params, enc_r, mask_r, shift,
                                            ylen0, umax,
                                            method="nat_decode",
                                            return_logits=True)
                att_pred = att_out.argmax(-1)
                # LM ranking (reference: cassnat.py:499-535)
                sos = jnp.ones((att_pred.shape[0], 1), att_pred.dtype)
                lm_out = lm.apply(lm_params,
                                  jnp.concatenate([sos, att_pred[:, :-1]],
                                                  1),
                                  method="forward_logits")
                tok_scores = jnp.take_along_axis(
                    lm_out, att_pred[..., None], axis=-1)[..., 0] \
                    .astype(jnp.float32) - jax.nn.logsumexp(
                        lm_out.astype(jnp.float32), axis=-1)
                slot_valid = jnp.arange(umax)[None, :] < (ylen - 1)[:, None]
                tok_scores = jnp.where(slot_valid, tok_scores, 0.0)
                cand = tok_scores.sum(-1) / jnp.maximum(
                    slot_valid.sum(-1), 1)
                best = cand.reshape(esa_batch, n_cand).argmax(-1)
                sel = att_pred.reshape(esa_batch, n_cand, umax)[
                    jnp.arange(esa_batch), best]
                return acc + sel.sum()
            return jax.lax.fori_loop(0, 3, body, jnp.zeros((), jnp.int32))
        return loop_esa

    def time_esa(loop_esa):
        np.asarray(loop_esa(params, lm_params, base_esa,
                            jax.random.PRNGKey(98)))
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            np.asarray(loop_esa(params, lm_params, base_esa,
                                jax.random.PRNGKey(10 + i)))
            ts.append(time.perf_counter() - t0)
        return (float(np.median(ts)) / 3) / (esa_batch * secs)

    # The remote compile service is high-variance; never let the ESA
    # sections prevent the primary metric from printing.
    esa_rtf = esa_topk_rtf = None
    try:
        note("compiling ESA parity loop")
        esa_rtf = time_esa(make_esa_loop(0))
        note("ESA parity done; compiling ESA topk16 loop")
        esa_topk_rtf = time_esa(make_esa_loop(16))
        note("ESA topk16 done")
    except Exception as e:  # pragma: no cover - infra failure path
        note(f"ESA section failed: {e!r}")

    result = {
        "metric": "nast_batched_decode_rtf",
        "value": round(rtf, 6),
        "unit": f"rtf (decode_s/audio_s), batch={batch}, conformer-CASSNAT "
                "d512, steady-state device loop",
        "vs_baseline": round(baseline_rtf / rtf, 2),
        "utts_per_sec_chip": round(batch / dt, 1),
    }
    if esa_rtf is not None:
        result.update(
            esa_rtf=round(esa_rtf, 6),
            esa_vs_baseline=round(baseline_rtf / esa_rtf, 2),
            esa_unit="rtf, ESA parity config: sample_num=50 thr=0.9 + "
                     "16L transformer-LM ranking, batch=16")
    if esa_topk_rtf is not None:
        result.update(
            esa_topk16_rtf=round(esa_topk_rtf, 6),
            esa_topk16_vs_baseline=round(baseline_rtf / esa_topk_rtf, 2),
            esa_topk16_unit="rtf, same config with esa_topk=16 CTC-path "
                            "preselection (TPU-native extension, default "
                            "off)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
