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


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh. data defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), \
        f"{data}x{model} != {len(devices)} devices"
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
    """NamedShardings for the param tree.

    Default layout: replicate everything over 'data'; shard the widest
    matmuls over 'model' when the mesh has a model axis > 1 — FFN kernels
    (d_model, d_ff) split on d_ff, their second kernels on d_model input,
    and vocab projections on the vocab dim. This is standard Megatron-style
    tensor parallelism expressed purely as shardings; XLA inserts the
    all-reduces.
    """
    model_size = mesh.shape[model_axis]

    def spec_for(path, leaf):
        if model_size == 1 or leaf.ndim < 2:
            return P()
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                        for p in path)
        d = leaf.shape
        # FFN up-projection / generator: shard output dim
        if ("ff" in name and "Dense_0" in name) or "proj" in name:
            return P(None, model_axis)
        # FFN down-projection: shard input dim
        if "ff" in name and "Dense_1" in name:
            return P(model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)
