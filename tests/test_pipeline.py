"""Pipeline-parallelism tests on a virtual 8-device CPU mesh.

Like tests/test_parallel.py, the suite body runs in a clean subprocess
(the axon sitecustomize breaks xla_force_host_platform_device_count).

Validates parallel/pipeline.py: a GPipe fill-and-drain schedule over a
'pipe' mesh axis (ppermute stage handoff inside shard_map) must match the
same layers run back-to-back on one device — forward AND gradients — with
each device holding only its stage's parameters, composed with data
parallelism on a ('data', 'pipe') mesh. The reference has no pipeline
parallelism (SURVEY.md §2.7: DDP only); this is a TPU-native extension.
"""

import os
import subprocess
import sys

SCRIPT = r'''
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cassnat_asr_public_tpu.parallel.pipeline import (
    microbatch,
    pipeline_apply,
    sequential_apply,
    stack_stage_params,
    stage_sharding,
    unmicrobatch,
)


def test_pipeline_matmul_stages_match_sequential():
    """4-stage dense+gelu pipeline == sequential, fwd + grad, on a
    ('data','pipe') = (2,4) mesh with the mb dim data-sharded."""
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "pipe"))
    d, n_stage, n_mb, mb, t = 32, 4, 6, 4, 16
    rng = np.random.default_rng(0)
    per_stage = [
        {"w": jnp.asarray(rng.normal(size=(d, d)) / np.sqrt(d),
                          jnp.float32),
         "b": jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)}
        for _ in range(n_stage)
    ]
    stacked = stack_stage_params(per_stage)
    x = jnp.asarray(rng.normal(size=(n_mb * mb, t, d)), jnp.float32)
    x_mb = microbatch(x, n_mb)

    def stage_fn(p, h):
        return jax.nn.gelu(h @ p["w"] + p["b"])

    ref = sequential_apply(stacked, stage_fn, x_mb)

    sharded = jax.tree_util.tree_map(
        jax.device_put, stacked, stage_sharding(mesh, stacked))
    # each pipe device holds exactly 1/S of every stage-stacked leaf
    for leaf in jax.tree_util.tree_leaves(sharded):
        shard_rows = {s.data.shape[0] for s in leaf.addressable_shards}
        assert shard_rows == {1}, shard_rows

    run = jax.jit(lambda p, xm: pipeline_apply(
        p, stage_fn, xm, mesh, batch_axis="data"))
    out = run(sharded, x_mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert unmicrobatch(out).shape == x.shape

    # gradients through the scanned schedule match the sequential stack
    def loss_pipe(p):
        y = pipeline_apply(p, stage_fn, x_mb, mesh, batch_axis="data")
        return jnp.sum(y ** 2)

    def loss_seq(p):
        return jnp.sum(sequential_apply(p, stage_fn, x_mb) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(sharded)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_pipeline_real_encoder_layers():
    """The production TrfEncoderLayer as the stage fn: a 4-deep encoder
    pipelined over ('pipe',)=4 devices matches the same stack applied
    layer-by-layer on one device."""
    from cassnat_asr_public_tpu.nn.blocks import TrfEncoderLayer

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("pipe",))
    d, n_stage, n_mb, mb, t = 32, 4, 4, 2, 12
    layer = TrfEncoderLayer(d_model=d, n_head=4, d_ff=64, dropout=0.0)
    x0 = jnp.zeros((mb, t, d), jnp.float32)
    per_stage = [
        layer.init(jax.random.PRNGKey(s), x0, None)["params"]
        for s in range(n_stage)
    ]
    stacked = stack_stage_params(per_stage)
    rng = np.random.default_rng(1)
    x_mb = jnp.asarray(rng.normal(size=(n_mb, mb, t, d)), jnp.float32)

    def stage_fn(p, h):
        return layer.apply({"params": p}, h, None)

    ref = sequential_apply(stacked, stage_fn, x_mb)
    sharded = jax.tree_util.tree_map(
        jax.device_put, stacked, stage_sharding(mesh, stacked))
    out = jax.jit(lambda p, xm: pipeline_apply(p, stage_fn, xm, mesh))(
        sharded, x_mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


test_pipeline_matmul_stages_match_sequential()
test_pipeline_real_encoder_layers()
print("ALL_OK")
'''


def test_pipeline_suite_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-3000:])
    assert "ALL_OK" in res.stdout
