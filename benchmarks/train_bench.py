"""Secondary benchmark: CASS-NAT training-step throughput on one chip.

Measures fwd+bwd+update tokens/sec for the production config with the
device-loop methodology (see bench.py). Not the headline metric (the driver
reads bench.py); run manually: python benchmarks/train_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.utils.config import Config

    args = Config(
        vocab_size=4999, N_enc=12, N_extra=1, N_self_dec=5, N_mix_dec=2,
        d_model=512, d_ff=2048, d_encff=1024, d_decff=1024, n_head=8,
        dropout=0.1, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
        label_smooth=0.1, padding_idx=0, use_conv_enc=True, use_conv_dec=True,
        enc_kernel_size=31, dec_kernel_size=3, enc_max_relative_len=20,
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
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(1e-3, b2=0.98))
    opt_state = tx.init(params)
    n_inner = 5
    # dropout keys use the hardware RBG generator — the shipped training
    # default on TPU (BaseTask.epoch_rng): threefry mask generation alone
    # costs ~13 ms/step here (benchmarks/dropout_rng_bench.py)
    impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"

    @jax.jit
    def loop_train(params, opt_state, base, key, dkey):
        def body(i, carry):
            params, opt_state = carry
            f = base + jax.random.normal(
                jax.random.fold_in(key, i), base.shape) * 1e-6

            def lf(p):
                out = model.apply(
                    p, f, mask, labels, lsizes, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(dkey, i)})
                return out["loss"]

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state
        return jax.lax.fori_loop(0, n_inner, body, (params, opt_state))

    dkey = jax.random.key(9, impl=impl)
    out = loop_train(params, opt_state, base, jax.random.PRNGKey(9), dkey)
    jax.block_until_ready(out)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop_train(params, opt_state, base,
                                         jax.random.PRNGKey(i), dkey))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_inner
    frames_per_step = B * T
    print(json.dumps({
        "metric": "cassnat_train_step_ms",
        "value": round(dt * 1000, 2),
        "unit": f"ms/step (B={B}, T={T} frames, U={U}); "
                f"{frames_per_step / dt / 1e3:.0f}k frames/s",
    }))


if __name__ == "__main__":
    main()
