"""Benchmark: NAST (CASS-NAT) batched single-pass decode RTF on one chip.

The reference's headline NAST number is RTF 0.011 (decode compute time /
audio duration) at batch_size 1 on GPU (reference: README.md:33; BASELINE.md).
Here the full pipeline — encoder, CTC head, best-path alignment, trigger
mask, NAT decoder — runs as one jitted batched function in bfloat16 on the
TPU's MXU. Synthetic utterances with the LibriSpeech test-clean mean duration
(~7.4 s -> ~740 fbank frames at 10 ms) and the production model config
(cassnat_train.yaml: conformer 12-enc d512, 1-extra 5-SAD 2-MAD conv decoder).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.nn.modules import enable_flash_attention
    from cassnat_asr_public_tpu.utils.config import Config
    from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit

    if jax.default_backend() in ("tpu", "axon"):
        enable_flash_attention(True)

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

    batch = 16
    secs = 7.4               # LibriSpeech test-clean mean utterance length
    frames = 736             # 7.36 s at 10 ms frame shift
    umax = 192               # max output tokens incl. eos slot

    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (batch, frames, input_size), jnp.float32)
    mask = jnp.ones((batch, frames), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (batch, 20), 3, 4999),
         jnp.full((batch, 1), 2, jnp.int32)], axis=1)
    label_sizes = jnp.full((batch,), 20, jnp.int32)

    params = model.init({"params": rng}, feats[:1], mask[:1], labels[:1],
                        label_sizes[:1])

    def run(key):
        return nat_decode_jit(model, params, feats, mask, key,
                              umax=umax, sample_num=1)

    # compile + warmup
    out = run(jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = run(jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    audio_seconds = batch * secs
    rtf = dt / audio_seconds
    utts_per_sec = batch / dt
    baseline_rtf = 0.011  # reference README.md:33
    print(json.dumps({
        "metric": "nast_batched_decode_rtf",
        "value": round(rtf, 6),
        "unit": "rtf (decode_s/audio_s), batch=16, conformer-CASSNAT d512",
        "vs_baseline": round(baseline_rtf / rtf, 2),
    }))
    # secondary line for humans (driver reads only the first JSON line)


if __name__ == "__main__":
    main()
