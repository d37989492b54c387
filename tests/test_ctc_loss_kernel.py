"""Pallas CTC loss kernel parity (values + gradients) vs the lax.scan
implementation.

Runs in a clean subprocess (interpret mode needs the axon hooks stripped —
see CLAUDE.md).
"""

import os
import subprocess
import sys

SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
from cassnat_asr_public_tpu.ops.ctc import (ctc_forward_score,
                                            enable_pallas_ctc_loss)
from cassnat_asr_public_tpu.kernels.ctc_loss import ctc_forward_score_pallas
enable_pallas_ctc_loss(False)  # scan is the oracle

def sweep(seed, bs, tmax, umax, vocab, block_b, tag):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    in_lens = jnp.asarray(rng.integers(2 * umax + 1, tmax + 1, size=(bs,)))
    lab_lens = jnp.asarray(rng.integers(1, umax + 1, size=(bs,)))
    labels = rng.integers(1, vocab, size=(bs, umax))
    labels = jnp.asarray(
        labels * (np.arange(umax)[None] < np.asarray(lab_lens)[:, None]))

    want = ctc_forward_score(lp, labels, in_lens, lab_lens)
    got = ctc_forward_score_pallas(lp, labels, in_lens, lab_lens, 0,
                                   block_b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # gradient parity: kernel posterior VJP vs autodiff through the scan
    f_scan = lambda x: (ctc_forward_score(x, labels, in_lens, lab_lens)
                        / jnp.maximum(lab_lens, 1)).mean()
    f_pal = lambda x: (ctc_forward_score_pallas(x, labels, in_lens,
                                                lab_lens, 0, block_b, True)
                       / jnp.maximum(lab_lens, 1)).mean()
    np.testing.assert_allclose(np.asarray(jax.grad(f_pal)(lp)),
                               np.asarray(jax.grad(f_scan)(lp)),
                               rtol=1e-4, atol=1e-5)
    print(tag, "ok")

sweep(0, 5, 30, 6, 9, 4, "base")
sweep(1, 3, 40, 9, 5, 2, "ragged-blocks")
sweep(2, 2, 150, 70, 12, 2, "S>128-pad")
sweep(3, 1, 17, 1, 4, 4, "single-label")
sweep(4, 8, 64, 20, 30, 8, "wide-vocab")

# impossible sequences (2U+1 > T): LOG_ZERO score, exactly-zero gradients
rng = np.random.default_rng(7)
lp = jax.nn.log_softmax(jnp.asarray(
    rng.normal(size=(3, 10, 6)).astype(np.float32)), -1)
labels = jnp.asarray(rng.integers(1, 6, size=(3, 8)))
lab_lens = jnp.asarray([8, 2, 8])
in_lens = jnp.asarray([10, 10, 4])
want = ctc_forward_score(lp, labels, in_lens, lab_lens)
got = ctc_forward_score_pallas(lp, labels, in_lens, lab_lens, 0, 4, True)
np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
g = jax.grad(lambda x: ctc_forward_score_pallas(
    x, labels, in_lens, lab_lens, 0, 4, True).sum())(lp)
assert bool(jnp.isfinite(g).all())
assert float(jnp.abs(g[0]).max()) == 0.0 and float(jnp.abs(g[2]).max()) == 0.0
print("impossible-seq ok")
print("ALL_OK")
"""


def test_ctc_loss_kernel_parity_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ALL_OK" in res.stdout
