"""Fused conformer-layer Pallas kernel vs the flax ConEncoderLayer, and
fused_encode_ctc vs model.encode_ctc (interpret mode; clean subprocess —
the axon sitecustomize corrupts Pallas interpret execution)."""

import os
import subprocess
import sys

CHECK = r"""
import numpy as np, jax, jax.numpy as jnp
from flax.core import freeze
from cassnat_asr_public_tpu.nn.blocks import ConEncoderLayer
from cassnat_asr_public_tpu.nn.modules import RelativePositionalEncoding
from cassnat_asr_public_tpu.kernels.conformer_layer import (
    conformer_layer_fused, conformer_layer_fused_qblocked,
    fused_encode_ctc)

rng = np.random.default_rng(0)
B, T, D, H, F, K, R = 3, 40, 64, 4, 128, 7, 8

layer = ConEncoderLayer(D, H, F, K, dropout=0.0, pos_type="relative",
                        compute_dtype=jnp.float32)
x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
lens = np.array([T, T - 7, T - 13])
mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
attn_mask = mask[:, None, :]
# clamped rel table like RelativePositionalEncoding emits
from cassnat_asr_public_tpu.nn.modules import sinusoidal_position_encoding
table = jnp.asarray(sinusoidal_position_encoding(2 * R + 1, D),
                    jnp.float32)
params = layer.init({"params": jax.random.PRNGKey(0)}, x, attn_mask,
                    table, True)

want = layer.apply(params, x, attn_mask, table, True)
got = conformer_layer_fused(params["params"], x,
                            mask.astype(jnp.float32), table, n_head=H,
                            interpret=True)
err = float(jnp.abs(got - want).max() / (jnp.abs(want).max() + 1e-9))
assert err < 2e-4, f"layer rel err {err}"
print("layer ok", err)

# T-blocked flash-style half A (VERDICT r4 item 7): tq=16 does NOT divide
# T=40, exercising the padded final query block
got_q = conformer_layer_fused_qblocked(params["params"], x,
                                       mask.astype(jnp.float32), table,
                                       n_head=H, tq=16, interpret=True)
err_q = float(jnp.abs(got_q - want).max() / (jnp.abs(want).max() + 1e-9))
assert err_q < 2e-4, f"qblocked layer rel err {err_q}"
print("qblocked layer ok", err_q)

# an all-pad row (len 0, e.g. last-row-repeat padding of a partial decode
# batch) must not NaN the softmax (0/0 guard in _layer_half_a_kernel)
mask0 = jnp.asarray(np.arange(T)[None, :] <
                    np.array([T, 0, T - 13])[:, None])
got0 = conformer_layer_fused(params["params"], x,
                             mask0.astype(jnp.float32), table, n_head=H,
                             interpret=True)
assert bool(jnp.isfinite(got0).all()), "NaN on fully-masked row"
print("masked-row ok")

# full encode path on a tiny CASS-NAT
import sys, os
sys.path.insert(0, os.environ["REPO_ROOT"])
from __graft_entry__ import _tiny_cassnat
model = _tiny_cassnat()
feats = jnp.asarray(rng.normal(size=(2, 64, 40)).astype(np.float32))
fmask = jnp.ones((2, 64), bool)
labels = jnp.concatenate(
    [jnp.asarray(rng.integers(3, 64, size=(2, 8)), jnp.int32),
     jnp.full((2, 1), 2, jnp.int32)], axis=1)
mp = model.init({"params": jax.random.PRNGKey(0)}, feats, fmask, labels,
                jnp.full((2,), 8, jnp.int32))
e1, m1, c1 = model.apply(mp, feats, fmask, method="encode_ctc")
e2, m2, c2 = fused_encode_ctc(model, mp, feats, fmask, interpret=True)
np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
rel = float(jnp.abs(e1 - e2).max() / (jnp.abs(e1).max() + 1e-9))
relc = float(jnp.abs(c1 - c2).max() / (jnp.abs(c1).max() + 1e-9))
assert rel < 5e-4, f"enc rel err {rel}"
assert relc < 5e-3, f"ctc rel err {relc}"
print("encode ok", rel, relc)
print("ALL_OK")
"""


def test_conformer_megakernel_parity_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    env["REPO_ROOT"] = repo
    res = subprocess.run([sys.executable, "-c", CHECK], env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ALL_OK" in res.stdout, res.stdout
