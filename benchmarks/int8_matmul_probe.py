"""Decision probe: does int8 matmul run at double rate on this TPU?

Answers whether an int8 weight-/activation-quantized inference path
(e.g. for the ESA rank LM) could beat bf16 on MXU throughput. v5p-class
chips advertise 2x int8 TOPs; v5e does not.

Methodology: the axon tunnel result-caches identical RPCs AND
`block_until_ready` does not actually synchronize through it, so honest
numbers need (a) a device-side dependency chain between iterations
(each matmul's output feeds the next input) and (b) host
materialization (`float(...)`) of the result, with a FRESH top-level
input per timed call. Without both, this probe reads 27-140 PFLOP/s.

Measured 2026-08-18 (TPU v5e, 4096^3):
    bf16: 0.338 ms/matmul -> 406 TOP/s   (~= the 394 bf16 peak)
    int8: 0.334 ms/matmul -> 411 TOP/s
=> int8 is NOT double-rate on this chip; an int8 compute path buys no
MXU throughput. (Weight-only int8 would still halve weight HBM traffic,
but the ESA rank stages are activation-traffic-dominated at
(N=256, U<=96, d=512) — activations are ~25x the weight bytes — so the
quantized-LM plan is dropped as a perf lever. Recorded as a negative
decision probe.)
"""

import time

import numpy as np


def bench(tag, dtype, pet):
    import jax
    import jax.numpy as jnp

    M = N = K = 4096
    b = jnp.asarray(np.random.randint(-5, 5, (K, N)), dtype=dtype)

    def loop(a, b):
        def body(i, carry):
            a, acc = carry
            r = jax.lax.dot_general(a, b, (([1], [0]), ([], [])),
                                    preferred_element_type=pet)
            # feed the result back into the next iteration's input so the
            # chain cannot be folded or cached
            a2 = (a + (r[:1, :1] % 3).astype(dtype)).astype(dtype)
            return (a2, acc + r[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, 100, body, (a, 0.0))[1]

    lj = jax.jit(loop)
    a0 = jnp.asarray(np.random.randint(-5, 5, (M, K)), dtype=dtype)
    float(lj(a0, b))  # warm + materialize
    times = []
    for _ in range(3):
        a = jnp.asarray(np.random.randint(-5, 5, (M, K)), dtype=dtype)
        float(a[0, 0])
        t0 = time.perf_counter()
        float(lj(a, b))
        times.append((time.perf_counter() - t0) / 100)
    per = min(times)
    print(f"{tag}: {per * 1e3:.4f} ms/matmul -> "
          f"{2 * M * N * K / per / 1e12:.1f} TOP/s")


def main():
    import jax.numpy as jnp

    bench("bf16", jnp.bfloat16, jnp.float32)
    bench("int8", jnp.int8, jnp.int32)


if __name__ == "__main__":
    main()
