"""Mesh + sharding helpers: the SPMD replacement for DDP/NCCL.

The reference's single parallelism strategy is NCCL data parallelism via
torch DDP + DistributedSampler (reference: src/bin/train_asr.py:85-88,
src/tasks/base_task.py:83, SURVEY.md §2.7). TPU-natively that becomes:

  * `jax.distributed.initialize()` on multi-host pods (auto on TPU),
  * a Mesh with a 'data' axis (extensible with a 'model' axis for tensor
    parallelism of the wide matmuls),
  * batch arrays sharded along 'data', params replicated (or sharded along
    'model'), with XLA inserting all-reduces over ICI,
  * metric reduction via jnp mean of the sharded loss (XLA psum), replacing
    explicit torch.distributed.all_reduce (reference: art_task.py:116-119).
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init():
    """Initialize multi-host JAX if launched under a pod/SLURM environment.

    Mirrors the reference's SLURM env plumbing (train_asr.py:27-35) but via
    jax.distributed: coordinator from MASTER_ADDR/PORT, process count/index
    from SLURM or JAX env vars. No-op on a single process.
    """
    # NOTE: must not touch jax.devices()/process_count() before
    # jax.distributed.initialize — that would initialize the XLA backend
    # single-process and make initialize() fail (caught by
    # tests/test_multihost.py). Detect multi-process from env only.
    n_proc = os.environ.get("SLURM_NTASKS") or os.environ.get("WORLD_SIZE")
    if n_proc and int(n_proc) > 1:
        coord = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "12355")
        pid = int(os.environ.get("SLURM_PROCID",
                                 os.environ.get("RANK", "0")))
        try:
            jax.distributed.initialize(
                coordinator_address=f"{coord}:{port}",
                num_processes=int(n_proc), process_id=pid)
        except RuntimeError as e:
            # Only the double-init error is benign; a genuine failure (bad
            # coordinator address, port in use) must not let a multi-process
            # job silently run single-process (ADVICE r2).
            if "already initialized" not in str(e).lower():
                raise


def make_mesh(data: Optional[int] = None, model: int = 1, pipe: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model'[, 'pipe']) mesh. data defaults to the remaining
    devices. The pipe axis is only materialized when pipe > 1 (config
    `pipeline_parallel`), keeping the common 2-axis shape otherwise."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (model * pipe)
    assert data * model * pipe == len(devices), \
        f"{data}x{model}x{pipe} != {len(devices)} devices"
    if pipe > 1:
        dev_array = np.asarray(devices).reshape(data, model, pipe)
        return Mesh(dev_array, ("data", "model", "pipe"))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, multi_host: Optional[bool] = None
                ) -> dict:
    """Device-put numpy batch arrays with batch-dim sharding.

    Scalars (0-d) are replicated — used for runtime knobs like the
    label-smoothing value or the plateau LR scale.

    Multi-host: each process holds only its shard of the global batch
    (SpeechDataLoader already splits batches per process), so a plain
    device_put onto a global NamedSharding would fail for non-addressable
    devices. Use jax.make_array_from_process_local_data, which assembles
    the global array from per-process locals.
    """
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    if multi_host is None:
        multi_host = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or np.isscalar(v):
            arr = np.asarray(v)
            if arr.ndim == 0:
                out[k] = jax.device_put(arr, rep)
            elif multi_host:
                out[k] = jax.make_array_from_process_local_data(sh, arr)
            else:
                out[k] = jax.device_put(arr, sh)
        else:
            out[k] = v
    return out


def param_sharding_rules(params, mesh: Mesh, model_axis: str = "model"):
    """NamedShardings for the param tree — Megatron-style tensor
    parallelism expressed purely as shardings; XLA GSPMD inserts the
    collectives over ICI.

    Layout over 'model' (replicated over 'data'):
      * attention q/k/v kernels (d, d): column-parallel P(None, model) —
        heads live in the output dim, so this is head parallelism;
      * attention output kernel (d, d): row-parallel P(model, None)
        (its all-reduce restores the replicated residual stream);
      * FFN up-projection (d, d_ff): column-parallel; FFN down-projection
        (d_ff, d): row-parallel;
      * vocab projections (generator `proj` (d, V)): column-parallel on
        the vocab dim (the log-softmax normalizer is the only cross-shard
        reduction);
      * token embedding tables (V, d): split on the vocab dim;
      * everything else (norms, biases, conv kernels, PE tables):
        replicated.
    """
    model_size = mesh.shape[model_axis]

    def dim_spec(leaf, dim):
        """Shard `dim` if divisible by the model size, else try the other
        dim, else replicate (e.g. the vocab 4999 is odd — its projections
        shard on the d_model dim instead)."""
        for d in (dim, 1 - dim):
            if leaf.shape[d] % model_size == 0:
                return P(*(model_axis if i == d else None
                           for i in range(leaf.ndim)))
        return P()

    def spec_for(path, leaf):
        if model_size == 1:
            return P()
        keys = tuple(str(p.key) if hasattr(p, "key") else str(p)
                     for p in path)
        name = "/".join(keys)
        if leaf.ndim == 2 and keys[-1] == "embedding":
            return dim_spec(leaf, 0)  # (V, d) token embedding: vocab dim
        if leaf.ndim < 2:
            return P()
        # attention projections (also the LM's CachedSelfAttention)
        if keys[-1] == "kernel" and len(keys) >= 2:
            owner = keys[-2]
            if owner in ("q", "k", "v", "pos"):
                return dim_spec(leaf, 1)
            if owner == "out":
                return dim_spec(leaf, 0)
            if owner == "linear_out" and leaf.ndim == 2:
                # frontend flatten->d_model projection: (C*F, d) is the
                # single largest matrix in the model — column-parallel
                return dim_spec(leaf, 1)
        # FFN up-projection / generator: shard output dim
        if ("ff" in name and "Dense_0" in name) or "proj" in name:
            return dim_spec(leaf, 1)
        # FFN down-projection: shard input dim
        if "ff" in name and "Dense_1" in name:
            return dim_spec(leaf, 0)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


# ---- activation sharding constraints --------------------------------------
# The residual stream is anchored to data-parallel-only sharding at layer
# boundaries; with the param shardings above, GSPMD then derives the
# head-/ff-parallel intermediate shardings and places the one all-reduce
# per attention/FFN block (the Megatron pattern). Models call
# `constrain_activation` which is a no-op unless a mesh was installed via
# `set_global_mesh` (so single-chip paths compile exactly as before).

_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]):
    """Install (or clear) the mesh used for activation constraints."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Optional[Mesh]:
    """The mesh installed by set_global_mesh (None outside SPMD tasks)."""
    return _GLOBAL_MESH


_PIPE_MICROBATCHES = 0


def set_pipe_microbatches(n: int):
    """Microbatch count for the pipelined encoder path (config
    `pp_microbatches`; 0 -> default to the pipe-axis size)."""
    global _PIPE_MICROBATCHES
    _PIPE_MICROBATCHES = int(n)


def pipe_config() -> tuple:
    """(mesh, n_stage, n_mb) when a pipe axis is active, else
    (None, 1, 1) — consumed by the encoders' pipelined layer path."""
    mesh = _GLOBAL_MESH
    if mesh is None:
        return None, 1, 1
    n_stage = mesh.shape.get("pipe", 1)
    if n_stage <= 1:
        return None, 1, 1
    n_mb = _PIPE_MICROBATCHES or n_stage
    return mesh, n_stage, n_mb


def constrain_activation(x, batch_axis: str = "data"):
    """Anchor a (B, ...) activation to batch-only sharding (replicated over
    'model'). No-op without an installed mesh."""
    mesh = _GLOBAL_MESH
    if mesh is None:
        return x
    n = mesh.shape.get(batch_axis, 1)
    if n <= 1 or x.shape[0] % n != 0:
        # non-divisible batches (model.init dummies, ragged tails) can't
        # be batch-sharded; leave their layout to GSPMD
        return x
    spec = P(batch_axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
