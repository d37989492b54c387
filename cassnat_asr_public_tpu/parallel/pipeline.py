"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference implements exactly one parallelism strategy — NCCL data
parallelism (reference: src/bin/train_asr.py:85-88, src/tasks/
base_task.py:83; SURVEY.md §2.7). This module is a TPU-native extension
in the same spirit as the tensor-parallel rules in parallel/mesh.py:
homogeneous encoder layers are staged over a `pipe` mesh axis, each
device holds only its stages' parameters, and activations circulate
between neighbouring stages over ICI via `lax.ppermute` inside a
`shard_map`.

Schedule: the classic GPipe fill-and-drain loop. With S stages and M
microbatches the loop runs M + S - 1 ticks; at tick t stage s computes
microbatch (t - s) (a bubble of S-1 idle ticks per stage at the ends).
The loop is a `lax.scan`, so the whole pipeline is reverse-mode
differentiable — `jax.grad` through `pipeline_apply` yields exactly the
1F1B-equivalent gradients of the sequential stack (verified in
tests/test_pipeline.py, forward AND grads, against running the layers
back-to-back on one device).

Layout contract:
  * `stacked_params`: a pytree whose leaves have a leading stage axis of
    size S (see `stack_stage_params`), sharded over `pipe` — each device
    materializes 1/S of the layer parameters (asserted in the test).
  * `x_mb`: (M, mb, ...) microbatched input, replicated over `pipe`
    (optionally sharded over a data axis on the mb dim for DP x PP).
  * `stage_fn(params_one_stage, x) -> y` with y.shape == x.shape — the
    per-stage computation (e.g. one flax encoder layer's `apply`).
"""

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.sharding import shard_map


def stack_stage_params(per_stage: Sequence):
    """Stack S per-stage param pytrees into one tree with leading stage
    axis — the layout `pipeline_apply` shards over the pipe axis."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_stage)


def stage_sharding(mesh: Mesh, stacked_params, axis: str = "pipe"):
    """NamedShardings placing each stage's slice on its pipe device."""
    def spec(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return jax.tree_util.tree_map(spec, stacked_params)


def pipeline_apply(stacked_params, stage_fn: Callable, x_mb, mesh: Mesh,
                   axis: str = "pipe", batch_axis: str = None):
    """Run the staged computation over the pipeline mesh axis.

    stacked_params leaves: (S, ...) sharded over `axis`; x_mb: a pytree
    (commonly a single array, or e.g. an (activation, mask) tuple) whose
    leaves are (M, mb, ...) with M microbatches (replicated over `axis`);
    stage_fn(params_one_stage, x) must return a pytree of the SAME
    structure and leaf shapes (pass-through leaves like masks ride the
    ppermute unchanged). Returns the (M, mb, ...) outputs, replicated
    over `axis`. If `batch_axis` names a mesh axis, the mb dims are
    additionally data-sharded over it (DP x PP).
    """
    tmap = jax.tree_util.tree_map
    n_stage = mesh.shape[axis]
    n_mb = jax.tree_util.tree_leaves(x_mb)[0].shape[0]
    assert all(
        leaf.shape[0] == n_stage
        for leaf in jax.tree_util.tree_leaves(stacked_params)), \
        f"stacked param leaves must have leading stage dim {n_stage}"

    def per_device(params_slice, xs):
        # shard_map hands each device a (1, ...) slice of every leaf
        local = tmap(lambda l: l[0], params_slice)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def tick(carry, t):
            y_prev, outs = carry
            # neighbours hand over last tick's activation (stage s reads
            # what stage s-1 produced at t-1 == microbatch t-s)
            recv = tmap(lambda l: jax.lax.ppermute(l, axis, perm), y_prev)
            feed = tmap(
                lambda l: jax.lax.dynamic_index_in_dim(
                    l, jnp.minimum(t, n_mb - 1), 0, keepdims=False), xs)
            x_in = tmap(lambda f, r: jnp.where(stage == 0, f, r),
                        feed, recv)
            y = stage_fn(local, x_in)
            out_idx = t - (n_stage - 1)
            valid = (stage == n_stage - 1) & (out_idx >= 0)
            upd = tmap(
                lambda o, yl: jax.lax.dynamic_update_index_in_dim(
                    o, yl, jnp.clip(out_idx, 0, n_mb - 1), 0), outs, y)
            outs = tmap(lambda o, u: jnp.where(valid, u, o), outs, upd)
            return (y, outs), None

        y0 = tmap(lambda l: jnp.zeros_like(l[0]), xs)
        outs0 = tmap(jnp.zeros_like, xs)
        (_, outs), _ = jax.lax.scan(tick, (y0, outs0),
                                    jnp.arange(n_mb + n_stage - 1))
        # only the last stage holds real outputs; psum broadcasts them
        outs = tmap(
            lambda o: jax.lax.psum(
                jnp.where(stage == n_stage - 1, o, jnp.zeros_like(o)),
                axis), outs)
        return outs

    x_specs = tmap(
        lambda l: P(None, batch_axis, *([None] * (l.ndim - 2))), x_mb)
    return shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), x_specs),
        out_specs=x_specs,
        check_rep=False,
    )(stacked_params, x_mb)


def pipeline_layer_stack(layer_params: Sequence, apply_one: Callable, x,
                         consts: Sequence, mesh: Mesh, n_mb: int,
                         axis: str = "pipe", batch_axis: str = "data"):
    """Pipeline a homogeneous layer stack given PER-LAYER param subtrees.

    The driver-integration entry point (config `pipeline_parallel`, see
    tasks/base.py): encoders keep their standard per-layer parameter
    layout (`layer{i}` subtrees, checkpoint-compatible with the
    sequential path) and this helper stacks them on the fly, groups them
    into `mesh.shape[axis]` stages of L/S consecutive layers, and runs
    the GPipe schedule. Param STORAGE stays as the caller placed it
    (replicated under pure DP); the shard_map in_spec slices each stage's
    parameters onto its pipe device at step entry, so stage compute and
    activation memory are partitioned over the pipe axis.

    layer_params: list of L per-layer param subtrees (identical treedefs).
    apply_one(p_layer, x, *consts) -> x' — one layer's functional apply.
    x: (B, ...) activation; consts: (B, ...) arrays riding through
    unchanged (attention masks, broadcast positional tables).
    """
    n_stage = mesh.shape[axis]
    n_layers = len(layer_params)
    assert n_layers % n_stage == 0, \
        f"{n_layers} layers not divisible into {n_stage} pipe stages"
    k = n_layers // n_stage
    stacked = stack_stage_params(layer_params)  # leaves (L, ...)
    stacked = jax.tree_util.tree_map(
        lambda l: l.reshape(n_stage, k, *l.shape[1:]), stacked)
    xs = tuple(microbatch(a, n_mb) for a in (x,) + tuple(consts))

    def stage_fn(p_stage, xm):
        h, cs = xm[0], xm[1:]

        def body(hh, i):
            p_i = jax.tree_util.tree_map(lambda l: l[i], p_stage)
            return apply_one(p_i, hh, *cs), None

        h, _ = jax.lax.scan(body, h, jnp.arange(k))
        return (h,) + cs

    out = pipeline_apply(stacked, stage_fn, xs, mesh, axis=axis,
                         batch_axis=batch_axis)
    return unmicrobatch(out[0])


def microbatch(x, n_mb: int):
    """(B, ...) -> (M, B/M, ...) microbatch view for pipeline_apply."""
    b = x.shape[0]
    assert b % n_mb == 0, f"batch {b} not divisible by {n_mb} microbatches"
    return x.reshape(n_mb, b // n_mb, *x.shape[1:])


def unmicrobatch(y):
    """Inverse of `microbatch`."""
    return y.reshape(y.shape[0] * y.shape[1], *y.shape[2:])


def sequential_apply(stacked_params, stage_fn: Callable, x_mb):
    """Single-device oracle: the same staged computation run back-to-back
    (what the pipeline must match exactly). x_mb may be a pytree like in
    `pipeline_apply`."""
    n_stage = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

    def body(x, s):
        local = jax.tree_util.tree_map(lambda l: l[s], stacked_params)
        return stage_fn(local, x), None

    def one_mb(x):
        y, _ = jax.lax.scan(body, x, jnp.arange(n_stage))
        return y

    return jax.vmap(one_mb)(x_mb)
