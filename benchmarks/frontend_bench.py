"""A/B: XLA two-conv frontend vs the fused Pallas kernel at decode shapes.

Production config: B=32, T=736, F=240, C=512, bf16. Methodology as bench.py
(device-side fori_loop over perturbed inputs).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n_inner=50, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(key, *a):
        def body(i, acc):
            return acc + fn(jax.random.fold_in(key, i), *a)
        return jax.lax.fori_loop(0, n_inner, body,
                                 jnp.zeros((), jnp.float32))

    np.asarray(loop(jax.random.PRNGKey(99), *args))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jax.random.PRNGKey(i), *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_inner


def main():
    import jax
    import jax.numpy as jnp

    from cassnat_asr_public_tpu.kernels.fused_frontend import \
        fused_conv_frontend

    B, T, F, C = 32, 736, 240, 512
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), dt)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.05, dt)
    b1 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, dt)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    def xla_path(key, x):
        xx = x + jax.random.normal(key, x.shape, dt) * 1e-6
        h = jax.lax.conv_general_dilated(
            xx[..., None], w1, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b1.astype(dt))
        h = jax.lax.conv_general_dilated(
            h, w2, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b2.astype(dt))
        return h.astype(jnp.float32).sum()

    def make_fused(tt):
        def fused(key, x):
            xx = x + jax.random.normal(key, x.shape, dt) * 1e-6
            h = fused_conv_frontend(xx, w1, b1, w2, b2, time_tile=tt)
            return h.astype(jnp.float32).sum()
        return fused

    t_xla = timed(xla_path, x)
    print(f"xla two-conv : {t_xla * 1e3:7.3f} ms")
    for tt in (8, 16, 23):
        t_fused = timed(make_fused(tt), x)
        print(f"fused tt={tt:3d} : {t_fused * 1e3:7.3f} ms "
              f"({t_xla / t_fused:.2f}x)")


if __name__ == "__main__":
    main()
