"""Fused Pallas conv frontend vs the XLA two-conv reference.

Interpret-mode parity in a clean subprocess (axon hooks stripped — see
tests/test_flash_attention.py), both at the raw-kernel level across a shape
sweep (odd time lengths, non-tile-multiple T4) and at the ConvEmbedding
module level (fused dispatch vs the lax.conv path on identical params).
"""

import os
import subprocess
import sys

CHECK = r"""
import numpy as np, jax, jax.numpy as jnp
from cassnat_asr_public_tpu.kernels.fused_frontend import fused_conv_frontend

rng = np.random.default_rng(0)

def ref(x, w1, b1, w2, b2):
    h = jax.lax.conv_general_dilated(x[..., None], w1, (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(h + b1)
    h = jax.lax.conv_general_dilated(h, w2, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(h + b2)

for (B, T, F, C, TT) in [(2, 64, 16, 8, 4), (1, 50, 16, 8, 4),
                         (2, 37, 48, 16, 8), (1, 92, 60, 8, 8),
                         (1, 33, 16, 8, 8)]:
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    want = np.asarray(ref(x, w1, b1, w2, b2))
    got = np.asarray(fused_conv_frontend(x, w1, b1, w2, b2, time_tile=TT,
                                         interpret=True))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    print("kernel", (B, T, F, C, TT), "ok")

# module-level: fused dispatch == lax.conv path on identical params.
from cassnat_asr_public_tpu.nn.modules import (ConvEmbedding,
                                               enable_fused_frontend)
emb = ConvEmbedding(input_size=16, d_model=8, dropout=0.0,
                    pos_type="absolute")
x = jnp.asarray(rng.standard_normal((2, 40, 16)), jnp.float32)
mask = jnp.ones((2, 40), bool)
params = emb.init({"params": jax.random.PRNGKey(0)}, x, mask)
assert set(params["params"]["conv1"]) == {"kernel", "bias"}
assert params["params"]["conv1"]["kernel"].shape == (3, 3, 1, 8)
enable_fused_frontend(False)
h_xla, m_xla = emb.apply(params, x, mask, deterministic=True)
enable_fused_frontend(True)
h_fused, m_fused = emb.apply(params, x, mask, deterministic=True)
enable_fused_frontend(None)
np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_xla),
                           rtol=2e-4, atol=2e-4)
np.testing.assert_array_equal(np.asarray(m_fused), np.asarray(m_xla))
print("module ok")
print("ALL_OK")
"""


def test_fused_frontend_parity_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    res = subprocess.run([sys.executable, "-c", CHECK], env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-3000:])
    assert "ALL_OK" in res.stdout
