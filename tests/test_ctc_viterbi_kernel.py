"""Pallas CTC Viterbi kernel parity vs the lax.scan implementation.

Runs in a clean subprocess (interpret mode needs the axon hooks stripped —
see CLAUDE.md).
"""

import os
import subprocess
import sys

SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
from cassnat_asr_public_tpu.ops.ctc import (ctc_viterbi_align,
                                            enable_pallas_viterbi)
from cassnat_asr_public_tpu.kernels.ctc_viterbi import ctc_viterbi_align_pallas

def sweep(seed, bs, tmax, umax, vocab, block_b, tag):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    in_lens = jnp.asarray(rng.integers(2 * umax + 1, tmax + 1, size=(bs,)))
    lab_lens = jnp.asarray(rng.integers(1, umax + 1, size=(bs,)))
    labels = rng.integers(1, vocab, size=(bs, umax))
    labels = jnp.asarray(
        labels * (np.arange(umax)[None] < np.asarray(lab_lens)[:, None]))

    want_shift, want_states = ctc_viterbi_align(lp, labels, in_lens, lab_lens)
    got_shift, got_states = ctc_viterbi_align_pallas(lp, labels, in_lens,
                                                     lab_lens,
                                                     block_b=block_b,
                                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(got_shift),
                                  np.asarray(want_shift))
    # states may only differ on padding frames; compare within true lengths
    for b in range(bs):
        t = int(in_lens[b])
        np.testing.assert_array_equal(np.asarray(got_states)[b, :t],
                                      np.asarray(want_states)[b, :t])
    print(tag, "ok")

sweep(0, 5, 30, 6, 9, 4, "base")
sweep(1, 3, 40, 9, 5, 2, "ragged-blocks")     # bs not multiple of block_b
sweep(2, 2, 150, 70, 12, 2, "S>128-pad")      # 2U+1 = 141 > one lane tile
sweep(3, 1, 17, 1, 4, 4, "single-label")
sweep(4, 8, 64, 20, 30, 8, "wide-vocab")

# the training default dispatches to the kernel when forced on
# (auto-mode only engages on TPU); interpret-mode equivalence:
shift_scan, _ = ctc_viterbi_align(
    jax.nn.log_softmax(jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 20, 6)).astype(np.float32)),
        -1),
    jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]]),
    jnp.asarray([20, 15]), jnp.asarray([3, 2]))
print("dispatch-scan ok")
print("ALL_OK")
"""


def test_viterbi_kernel_parity_clean_env():
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
