"""A/B of compact-table -> (Tq,Tk) relative-bias expansion lowerings.

The compact rel-attention scores (B,H,T,2R+1) must be expanded to a
(T,T) Toeplitz band. Candidates, timed at BOTH the encoder shape
(B=32,H=8,T=184,R=20) and the ESA NAT-decoder shape (N=800,H=8,U=96,R=8):

  onehot  — einsum with a (T,T,2R+1) one-hot (what nn/modules.py ships)
  flat    — single GEMM with a ((T*(2R+1)), T*T) flattened one-hot
  gather  — take_along_axis with broadcast (B,H,T,T) indices
  select  — sum over 2R+1 of where(off==o, small[...,o,None], 0)

All parity-checked against onehot before timing.
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
        return jax.lax.fori_loop(0, n_inner, body, jnp.zeros((), jnp.float32))

    np.asarray(loop(jax.random.PRNGKey(99), *args))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(jax.random.PRNGKey(i), *args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_inner


def run(B, H, T, R):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16
    O = 2 * R + 1
    rng = jax.random.PRNGKey(0)
    small = jax.random.normal(rng, (B, H, T, O), jnp.float32)
    off = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None],
                   -R, R) + R  # (T, T)

    def v_onehot(key, small):
        s = small + jax.random.uniform(key, (), jnp.float32) * 1e-6
        E = jax.nn.one_hot(off, O, dtype=dt)
        return jnp.einsum("bhqo,qko->bhqk", s.astype(dt), E,
                          preferred_element_type=jnp.float32).sum()

    def v_flat(key, small):
        s = small + jax.random.uniform(key, (), jnp.float32) * 1e-6
        # E2[(q, o), (q2, k)] = (q == q2) & (off[q, k] == o)
        qo = jnp.arange(T)[:, None, None, None]
        oo = jnp.arange(O)[None, :, None, None]
        q2 = jnp.arange(T)[None, None, :, None]
        kk = jnp.arange(T)[None, None, None, :]
        E2 = ((qo == q2) & (off[q2.squeeze((0, 1, 3)), :][None, None] == oo)
              ).astype(dt).reshape(T * O, T * T)
        out = s.astype(dt).reshape(B * H, T * O) @ E2
        return out.astype(jnp.float32).sum()

    def v_gather(key, small):
        s = small + jax.random.uniform(key, (), jnp.float32) * 1e-6
        idx = jnp.broadcast_to(off[None, None], (B, H, T, T))
        return jnp.take_along_axis(s, idx, axis=-1).sum()

    def v_select(key, small):
        s = small + jax.random.uniform(key, (), jnp.float32) * 1e-6
        out = jnp.zeros((B, H, T, T), jnp.float32)
        for o in range(O):
            out = out + jnp.where(off[None, None] == o, s[..., o, None], 0.0)
        return out.sum()

    import jax
    ref = float(jax.jit(v_onehot)(jax.random.PRNGKey(5), small))
    outs = {}
    for name, fn in [("flat", v_flat), ("gather", v_gather),
                     ("select", v_select)]:
        got = float(jax.jit(fn)(jax.random.PRNGKey(5), small))
        rel = abs(got - ref) / (abs(ref) + 1e-9)
        assert rel < 1e-2, (name, got, ref)
        outs[name] = rel
    print(f"shape B={B} H={H} T={T} R={R} (parity ok: {outs})", flush=True)
    for name, fn in [("onehot", v_onehot), ("flat", v_flat),
                     ("gather", v_gather), ("select", v_select)]:
        print(f"  {name:7s}: {timed(fn, small) * 1e3:8.3f} ms", flush=True)


def main():
    run(32, 8, 184, 20)   # encoder shape
    run(800, 8, 96, 8)    # ESA NAT-decoder shape


if __name__ == "__main__":
    main()
