"""Train-step stage split: where do the 85 ms go?

Times fwd+bwd of the full CASS-NAT train step and of isolated stages
(encoder fwd+bwd, CTC loss DP fwd+bwd, Viterbi align fwd) at the
production config, device-loop methodology. Locates the next training
lever (e.g. is a Pallas CTC forward-backward kernel worth building?).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, n_inner=5, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(key, *a):
        def body(i, acc):
            return acc + fn(jax.random.fold_in(key, i), *a)
        return jax.lax.fori_loop(0, n_inner, body,
                                 jnp.zeros((), jnp.float32))

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
    from cassnat_asr_public_tpu.ops.ctc import ctc_loss, ctc_viterbi_align
    from cassnat_asr_public_tpu.utils.config import Config

    args = Config(
        vocab_size=4999, N_enc=12, N_extra=1, N_self_dec=5, N_mix_dec=2,
        d_model=512, d_ff=2048, d_encff=1024, d_decff=1024, n_head=8,
        dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
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

    # full train fwd+bwd (no optimizer update)
    def full_fwdbwd(key, params, base):
        f = base + jax.random.normal(key, base.shape) * 1e-6

        def lf(p):
            return model.apply(p, f, mask, labels, lsizes,
                               deterministic=True)["loss"]
        loss, grads = jax.value_and_grad(lf)(params)
        return loss + jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(jnp.float32).sum() * 0.0, grads, 0.0)

    print(f"full fwd+bwd           : "
          f"{timed(full_fwdbwd, (params, base)) * 1e3:8.2f} ms", flush=True)

    # encoder (+ctc head) fwd+bwd
    def enc_fwdbwd(key, params, base):
        f = base + jax.random.normal(key, base.shape) * 1e-6

        def lf(p):
            h, m, c = model.apply(p, f, mask, method="encode_ctc")
            return c.astype(jnp.float32).sum() * 1e-6
        loss, grads = jax.value_and_grad(lf)(params)
        return loss + jax.tree_util.tree_reduce(
            lambda a, x: a + x.astype(jnp.float32).sum() * 0.0, grads, 0.0)

    print(f"encoder+ctc fwd+bwd    : "
          f"{timed(enc_fwdbwd, (params, base)) * 1e3:8.2f} ms", flush=True)

    def enc_fwd(key, params, base):
        f = base + jax.random.normal(key, base.shape) * 1e-6
        h, m, c = model.apply(params, f, mask, method="encode_ctc")
        return c.astype(jnp.float32).sum()

    print(f"encoder+ctc fwd        : "
          f"{timed(enc_fwd, (params, base)) * 1e3:8.2f} ms", flush=True)

    # isolated CTC loss DP fwd+bwd on realistic shapes (Tp = T//4)
    _, _, ctc_out = jax.jit(lambda p, f: model.apply(
        p, f, mask, method="encode_ctc"))(params, base)
    ctc_out = ctc_out.astype(jnp.float32)
    tp = ctc_out.shape[1]
    in_lens = jnp.full((B,), tp, jnp.int32)

    def loss_fwdbwd(key, ctc_out):
        c = ctc_out + jax.random.uniform(key, (), jnp.float32) * 1e-6

        def lf(x):
            return ctc_loss(x, labels[:, :-1], in_lens, lsizes)
        loss, g = jax.value_and_grad(lf)(c)
        return loss + g.sum() * 0.0

    print(f"ctc loss DP fwd+bwd    : "
          f"{timed(loss_fwdbwd, (ctc_out,)) * 1e3:8.2f} ms", flush=True)

    def viterbi_fwd(key, ctc_out):
        c = ctc_out + jax.random.uniform(key, (), jnp.float32) * 1e-6
        shift, _ = ctc_viterbi_align(c, labels[:, :-1], in_lens, lsizes)
        return shift.sum().astype(jnp.float32)

    print(f"viterbi align fwd      : "
          f"{timed(viterbi_fwd, (ctc_out,)) * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
