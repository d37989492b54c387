"""Dropout RNG cost in the train step: threefry vs rbg PRNG.

train_stage_bench measures full fwd+bwd at 44 ms with dropout=0.0 while
train_bench records 85.7 ms with dropout=0.1 — if most of that gap is
threefry key generation for the ~40 dropout masks, switching the dropout
PRNG to the hardware RBG generator (jax_default_prng_impl=rbg or
threefry_partitionable) is a large training win. This probes it.

Env: CASSNAT_PRNG=rbg|threefry (default threefry) — re-run per impl.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    impl = os.environ.get("CASSNAT_PRNG", "threefry")
    if impl == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    elif impl == "partitionable":
        jax.config.update("jax_threefry_partitionable", True)

    import jax.numpy as jnp

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.utils.config import Config

    for dropout in (0.0, 0.1):
        args = Config(
            vocab_size=4999, N_enc=12, N_extra=1, N_self_dec=5, N_mix_dec=2,
            d_model=512, d_ff=2048, d_encff=1024, d_decff=1024, n_head=8,
            dropout=dropout, ctc_alpha=1.0, interctc_alpha=0.0,
            interctc_layer=0, label_smooth=0.1, padding_idx=0,
            use_conv_enc=True, use_conv_dec=True, enc_kernel_size=31,
            dec_kernel_size=3, enc_max_relative_len=20,
            dec_max_relative_len=8, pos_type="relative", share_ff=False,
            use_trigger=True, src_trigger=True, use_unimask=False,
            use_best_path=False, compute_dtype=jnp.bfloat16,
        )
        model = make_cassnat(240, args)
        B, T, U = 16, 736, 64
        rng = jax.random.PRNGKey(0)
        base = jax.random.normal(rng, (B, T, 240), jnp.float32)
        mask = jnp.ones((B, T), bool)
        labels = jax.random.randint(rng, (B, U + 1), 3, 4999)
        labels = labels.at[:, U].set(0).at[:, U - 1].set(2)
        lsizes = jnp.full((B,), U - 1, jnp.int32)
        params = model.init({"params": rng}, base[:1, :64], mask[:1, :64],
                            labels[:1], lsizes[:1])

        @jax.jit
        def loop(params, base, key):
            def body(i, acc):
                f = base + jax.random.normal(
                    jax.random.fold_in(key, i), base.shape) * 1e-6

                def lf(p):
                    return model.apply(
                        p, f, mask, labels, lsizes,
                        deterministic=(dropout == 0.0),
                        rngs=({"dropout": jax.random.fold_in(key, i)}
                              if dropout > 0 else {}))["loss"]
                loss, grads = jax.value_and_grad(lf)(params)
                return acc + loss + jax.tree_util.tree_reduce(
                    lambda a, x: a + x.astype(jnp.float32).sum() * 0.0,
                    grads, 0.0)
            return jax.lax.fori_loop(0, 5, body, jnp.zeros((), jnp.float32))

        np.asarray(loop(params, base, jax.random.PRNGKey(9)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(params, base, jax.random.PRNGKey(i)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / 5
        print(f"prng={impl} dropout={dropout}: {dt * 1e3:8.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
