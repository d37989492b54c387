"""AST AR beam decode RTF (KV-cached, beam 20 + CTC-prefix joint scoring).

Reference baseline: RTF 0.562, batch 1 on GPU (reference README.md:31,
beam_width 20 ctc_beam 30; conf/transformer_decode.yaml). Methodology as
bench.py: perturbed inputs; the beam loop is sequential over up to
max_steps tokens so a small utterance batch is realistic.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_transformer
    from cassnat_asr_public_tpu.utils.config import Config
    from cassnat_asr_public_tpu.utils.decoding import \
        ar_beam_decode_cached_jit

    args = Config(
        vocab_size=4999, N_enc=12, N_dec=6, d_model=512, d_ff=2048,
        n_head=8, dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0,
        interctc_layer=0, label_smooth=0.1, padding_idx=0,
        pos_type="relative", use_conv_enc=True, enc_kernel_size=31,
        enc_max_relative_len=20, d_encff=1024, share_ff=False,
        compute_dtype=jnp.bfloat16,
    )
    model = make_transformer(240, args)

    B, T, secs = 8, 736, 7.4
    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (B, T, 240), jnp.float32)
    mask = jnp.ones((B, T), bool)
    labels = jnp.concatenate(
        [jax.random.randint(rng, (1, 20), 3, 4999),
         jnp.full((1, 1), 2, jnp.int32)], axis=1)
    params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                        labels[:, :-1], labels[:, 1:],
                        jnp.full((1,), 20, jnp.int32))

    def decode(p, feats):
        out = ar_beam_decode_cached_jit(
            model, p, feats, mask, beam_width=20, ctc_beam=30,
            ctc_weight=0.4, max_steps=60)
        return out["tokens"], out["lengths"]

    jd = jax.jit(decode)
    np.asarray(jd(params, base)[0])
    ts = []
    for i in range(4):
        f = base + jax.random.normal(jax.random.PRNGKey(i), base.shape,
                                     jnp.float32) * 1e-6
        t0 = time.perf_counter()
        np.asarray(jd(params, f)[0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rtf = dt / (B * secs)
    print(f"ar_beam cached: {dt * 1e3:.1f} ms/batch, rtf={rtf:.5f}, "
          f"vs 0.562 = {0.562 / rtf:.1f}x")


if __name__ == "__main__":
    main()
