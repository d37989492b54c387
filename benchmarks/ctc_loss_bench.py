"""On-chip A/B for the Pallas CTC loss kernel (kernels/ctc_loss.py) vs the
lax.scan formulation (ops/ctc.py) — both standalone (value_and_grad of the
loss at production shapes) and inside the full CASS-NAT train step.

Device-loop methodology (see bench.py): fori_loop over perturbed inputs,
median of 3 outer reps. Run manually on the TPU: python benchmarks/ctc_loss_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_loop(fn, *args, reps=3):
    import jax
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def standalone(enable):
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.ops import ctc as C
    C.enable_pallas_ctc_loss(enable)

    B, T, U, V = 16, 184, 63, 4999  # post-subsample production shapes
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (B, T, V), jnp.float32)
    labels = jax.random.randint(rng, (B, U), 3, V)
    in_lens = jnp.full((B,), T, jnp.int32)
    lab_lens = jnp.full((B,), U, jnp.int32)
    n_inner = 10

    @jax.jit
    def loop(logits, key):
        def body(i, acc):
            x = logits + jax.random.normal(
                jax.random.fold_in(key, i), logits.shape) * 1e-6
            lp = jax.nn.log_softmax(x, -1)
            loss, g = jax.value_and_grad(
                lambda l: C.ctc_loss(l, labels, in_lens, lab_lens))(lp)
            return acc + loss + g[0, 0, 0]
        return jax.lax.fori_loop(0, n_inner, body, 0.0)

    dt = time_loop(loop, logits, jax.random.PRNGKey(1)) / n_inner
    return dt * 1000


def train_step(enable):
    import jax
    import jax.numpy as jnp
    import optax

    from cassnat_asr_public_tpu.models import make_cassnat
    from cassnat_asr_public_tpu.ops import ctc as C
    from cassnat_asr_public_tpu.utils.config import Config
    C.enable_pallas_ctc_loss(enable)

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
    dt = time_loop(loop_train, params, opt_state, base,
                   jax.random.PRNGKey(7), dkey) / n_inner
    return dt * 1000


def main():
    scan_ms = standalone(False)
    pallas_ms = standalone(True)
    step_scan = train_step(False)
    step_pallas = train_step(True)
    print(json.dumps({
        "metric": "ctc_loss_fwd+bwd_ms",
        "scan": round(scan_ms, 3),
        "pallas": round(pallas_ms, 3),
        "speedup": round(scan_ms / pallas_ms, 2),
        "train_step_scan_ms": round(step_scan, 2),
        "train_step_pallas_ms": round(step_pallas, 2),
        "unit": "ms (B=16, T'=184, U=63, V=4999; train step B=16 T=736)",
    }))


if __name__ == "__main__":
    main()
