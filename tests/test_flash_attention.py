"""Pallas flash attention vs XLA reference.

The axon TPU plugin in this image monkey-patches Pallas at interpreter
startup (sitecustomize) in ways that corrupt interpret-mode execution, so the
parity checks run in a clean subprocess with the axon hooks stripped from
PYTHONPATH. On real TPU the kernel compiles natively.
"""

import os
import subprocess
import sys

CHECK = r"""
import numpy as np, jax, jax.numpy as jnp
from cassnat_asr_public_tpu.kernels.flash_attention import (
    flash_attention, flash_attention_reference)
rng = np.random.default_rng(0)

def check(b, h, tq, tk, d, bq, bk, masked, tag):
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    if masked:
        m = rng.random((b, tq, tk)) > 0.4
        m[:, min(5, tq - 1)] = False
        m[0, :, (3 * tk) // 4:] = False
        mask = jnp.asarray(m)
    else:
        mask = None
    got = flash_attention(q, k, v, mask, block_q=bq, block_k=bk,
                          interpret=True)
    ref = flash_attention_reference(q, k, v, mask)
    err = float(jnp.abs(got - ref).max())
    assert err < 2e-3, f"{tag}: max err {err}"
    if masked:
        assert float(jnp.abs(got[:, :, min(5, tq - 1)]).max()) == 0.0, tag
    print(tag, "ok", err)

check(2, 2, 64, 96, 32, 32, 32, False, "unmasked")
check(2, 2, 48, 80, 32, 16, 16, True, "masked")
check(1, 3, 50, 70, 16, 32, 32, True, "ragged")

# bias path (relative-position term)
q = jnp.asarray(rng.normal(size=(1, 2, 40, 16)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(1, 2, 40, 16)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(1, 2, 40, 16)).astype(np.float32))
bias = jnp.asarray(rng.normal(size=(1, 2, 40, 40)).astype(np.float32))
mask = jnp.asarray(rng.random((1, 40, 40)) > 0.3)
got = flash_attention(q, k, v, mask, bias=bias, block_q=16, block_k=16,
                      interpret=True)
import math
s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(16) + bias
s = jnp.where(mask[:, None], s, -1e30)
w = jax.nn.softmax(s, -1)
w = jnp.where(mask[:, None], w, 0.0)
ref = jnp.einsum("bhqk,bhkd->bhqd", w, v)
err = float(jnp.abs(got - ref).max())
assert err < 2e-3, f"bias: {err}"
print("bias ok", err)

print("ALL_OK")
"""


def test_flash_attention_parity_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # strip the axon sitecustomize dir; keep the repo importable
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    res = subprocess.run([sys.executable, "-c", CHECK], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ALL_OK" in res.stdout, res.stdout
