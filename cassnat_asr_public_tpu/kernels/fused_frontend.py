"""Pallas TPU kernel: fused 2-layer strided-conv frontend.

The reference frontend (reference: src/models/modules/embedding.py:89-124)
is Conv2d(1->d, 3x3, s2) + ReLU + Conv2d(d->d, 3x3, s2) + ReLU over the
(time, freq) grid of the spliced features. At the production config
(B=32, T=736, F=240, d=512) the conv1 intermediate is (B, 368, 120, 512)
— ~1.4 GB in bf16 — and XLA materializes it in HBM between the two convs,
paying the write + re-read (~3 GB of traffic) on top of running conv1 as a
channels-in=1 convolution that cannot tile well on the MXU.

This kernel computes the whole chain per (batch, time-tile) program:

  * the padded input slice (with halo) is DMA'd HBM->VMEM per program,
  * conv1 is an im2col GEMM (positions, 9->16) @ (16, d) — tiny FLOPs,
  * its ReLU'd output stays in VMEM and is consumed immediately by conv2
    as nine accumulated (positions, d) @ (d, d) GEMM taps (the MXU-friendly
    lowering, same math as ops `conv3x3_s2_taps`),
  * only the final (B, T4, F4, d) tensor is written back.

Mosaic does not allow stride-2 vector slices, so the stride-2 convs are
expressed polyphase: the input is freq-de-interleaved outside the kernel
(even/odd lane planes) and all stride-2 time/freq accesses inside become
stride-1 slices of (n, 2, ...) reshapes on non-lane dims.

Weights are passed with constant index maps so they are fetched into VMEM
once and stay resident across the grid. Accumulation is f32; inputs,
weights, and outputs use the caller's compute dtype (bf16 in production).

Forward-only: adoption is gated to deterministic (inference) calls on TPU
— training keeps the XLA conv path (see nn/modules.py ConvEmbedding).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _frontend_kernel(xe_ref, xo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     out_ref, xe_v, xo_v, sem_e, sem_o, *, tt: int, t2: int,
                     f2: int, f4: int, c: int):
    """One (batch, time-tile) program.

    xe_ref/xo_ref: (B, Tp, F2+1) even/odd freq planes of the padded input,
    in HBM. w1_ref: (16, C) conv1 taps (9 + zero pad) in VMEM.
    w2_ref: (3, 3, C, C); b*_ref: (1, C). out_ref block: (1, TT, F4, C).
    xe_v/xo_v: (4*TT+8, F2+1) VMEM scratch for the slices + halo.
    """
    b = pl.program_id(0)
    a = pl.program_id(1)
    r2 = 2 * tt + 1  # conv1 rows needed for this tile (incl. halo)

    # ---- fetch the input slices: rows [4*TT*a, 4*TT*a + 4*TT+8).
    start = pl.multiple_of(4 * tt * a, 4 * tt)
    de = pltpu.make_async_copy(
        xe_ref.at[b, pl.ds(start, 4 * tt + 8)], xe_v, sem_e)
    do = pltpu.make_async_copy(
        xo_ref.at[b, pl.ds(start, 4 * tt + 8)], xo_v, sem_o)
    de.start()
    do.start()
    de.wait()
    do.wait()
    fcols = xe_v.shape[-1]  # f2+1 rounded up to a 128-lane multiple
    # split the time (sublane) dim into (rows/2, parity) — row 2k+p of the
    # slice is resh[k, p].
    xe = xe_v[:].reshape(2 * tt + 4, 2, fcols)
    xo = xo_v[:].reshape(2 * tt + 4, 2, fcols)

    # ---- conv1 as im2col GEMM: patches (R2*F2, 16) @ w1 (16, C).
    # Output row r <-> absolute t2 index (2*TT*a - 1 + r). Padded input
    # row for tap dt is (2r + dt) relative to the slice; padded col for
    # tap df is (2*f2 + df): even plane for df in {0, 2}, odd for df = 1.
    # (patches assembled in f32: Mosaic only supports non-trivial minor-dim
    # insertion for 32-bit types; conv1's GEMM is tiny so f32 is free.)
    taps = []
    for dt in range(3):
        re_, pe = dt // 2, dt % 2
        rows_e = xe[re_:re_ + r2, pe].astype(jnp.float32)  # (R2, F2+1)
        rows_o = xo[re_:re_ + r2, pe].astype(jnp.float32)
        taps.append(rows_e[:, :f2])          # df = 0
        taps.append(rows_o[:, :f2])          # df = 1
        taps.append(rows_e[:, 1:f2 + 1])     # df = 2
    patches = jnp.stack(taps, axis=-1)       # (R2, F2, 9)
    # pad the tap axis to 16 (w1 is pre-padded with zero rows) so the GEMM
    # K dim is sublane-aligned.
    patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 7)))
    h1 = jnp.dot(patches.reshape(r2 * f2, 16), w1_ref[:],
                 preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0].astype(jnp.float32)
    h1 = jnp.maximum(h1, 0.0).reshape(r2, f2, c)
    # zero rows outside the valid t2 range: conv2's own time padding.
    t2_abs = 2 * tt * a - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (r2, 1, 1), 0)
    valid = (t2_abs >= 0) & (t2_abs < t2)
    h1 = jnp.where(valid, h1, 0.0).astype(xe.dtype)
    # pad: freq 1 both sides (conv2 padding), rows to even count, then
    # split time and freq dims into (half, parity) for stride-1 taps.
    h1p = jnp.pad(h1, ((0, 1), (1, 1), (0, 0)))
    h1p = h1p.reshape(tt + 1, 2, (f2 + 2) // 2, 2, c)

    # ---- conv2 as 9 accumulated GEMM taps: (TT*F4, C) @ (C, C).
    # out (i, f4) reads h1 tile row (2i + dt2), padded col (2*f4 + df2).
    acc = jnp.zeros((tt * f4, c), jnp.float32)
    for dt2 in range(3):
        ri, pi = dt2 // 2, dt2 % 2
        for df2 in range(3):
            ci, qi = df2 // 2, df2 % 2
            sl = h1p[ri:ri + tt, pi, ci:ci + f4, qi]  # (TT, F4, C)
            acc = acc + jnp.dot(sl.reshape(tt * f4, c),
                                w2_ref[dt2, df2],
                                preferred_element_type=jnp.float32)
    out = jnp.maximum(acc + b2_ref[0].astype(jnp.float32), 0.0)
    out_ref[0] = out.astype(out_ref.dtype).reshape(tt, f4, c)


@functools.partial(jax.jit,
                   static_argnames=("time_tile", "interpret"))
def fused_conv_frontend(x, w1, b1, w2, b2, *, time_tile: int = 8,
                        interpret: bool = False):
    """relu(conv2(relu(conv1(x)))) for the 3x3/s2/p1 frontend, fused.

    x: (B, T, F); w1: (3, 3, 1, C); w2: (3, 3, C, C); biases (C,).
    Returns (B, T4, F4, C) with T4 = ceil(ceil(T/2)/2), F4 likewise —
    exactly the shape/values of the two chained `nn.Conv` calls in
    ConvEmbedding (parity-tested in tests/test_fused_frontend.py).

    Requires F even and F//2 even (true for the 80/240-dim feature configs).
    """
    bsz, t, f = x.shape
    c = w2.shape[-1]
    t2, f2 = (t + 1) // 2, (f + 1) // 2
    t4, f4 = (t2 + 1) // 2, (f2 + 1) // 2
    assert f % 2 == 0 and f2 % 2 == 0, "freq dims must be even"
    tt = time_tile
    n_tiles = -(-t4 // tt)
    t4c = n_tiles * tt
    # time: front pad 3 (conv pad 1 at both levels) + back pad so every
    # tile's slice [4*TT*a, +4*TT+8) is in bounds; freq: pad 1 each side,
    # then de-interleave into even/odd lane planes (polyphase).
    back = 4 * t4c + 8 - 3 - t
    xp = jnp.pad(x, ((0, 0), (3, back), (1, 1)))
    xe = xp[:, :, 0::2]   # padded cols 0, 2, ... -> (B, Tp, F2+1)
    xo = xp[:, :, 1::2]
    # DMA slices must span full, 128-aligned lane extents.
    fpad = -(-(f2 + 1) // 128) * 128 - (f2 + 1)
    xe = jnp.pad(xe, ((0, 0), (0, 0), (0, fpad)))
    xo = jnp.pad(xo, ((0, 0), (0, 0), (0, fpad)))
    # conv1 kernel rows padded 9 -> 16 for K alignment, tap order matching
    # the kernel's patch stacking: (dt, df) row-major.
    w1r = jnp.pad(w1.reshape(9, c), ((0, 7), (0, 0)))

    kernel = functools.partial(_frontend_kernel, tt=tt, t2=t2, f2=f2,
                               f4=f4, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, c), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM),       # w1 taps (f32)
            pl.BlockSpec((1, c), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda b, a: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, a: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, f4, c), lambda b, a: (b, a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t4c, f4, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4 * tt + 8, f2 + 1 + fpad), x.dtype),
            pltpu.VMEM((4 * tt + 8, f2 + 1 + fpad), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xe, xo, w1r.astype(jnp.float32), b1.reshape(1, c),
      w2.astype(x.dtype), b2.reshape(1, c))
    return out[:, :t4]
