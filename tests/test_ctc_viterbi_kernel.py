"""Pallas CTC Viterbi kernel parity vs the lax.scan implementation.

Runs in a clean subprocess (interpret mode needs the axon hooks stripped —
see CLAUDE.md).
"""

import os
import subprocess
import sys

SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
from cassnat_asr_public_tpu.ops.ctc import ctc_viterbi_align
from cassnat_asr_public_tpu.kernels.ctc_viterbi import ctc_viterbi_align_pallas

rng = np.random.default_rng(0)
bs, tmax, umax, vocab = 5, 30, 6, 9
logits = rng.normal(size=(bs, tmax, vocab)).astype(np.float32)
lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
in_lens = jnp.asarray(rng.integers(2 * umax + 1, tmax + 1, size=(bs,)))
lab_lens = jnp.asarray(rng.integers(1, umax + 1, size=(bs,)))
labels = rng.integers(1, vocab, size=(bs, umax))
labels = jnp.asarray(labels * (np.arange(umax)[None] < np.asarray(lab_lens)[:, None]))

want_shift, want_states = ctc_viterbi_align(lp, labels, in_lens, lab_lens)
got_shift, got_states = ctc_viterbi_align_pallas(lp, labels, in_lens,
                                                 lab_lens, block_b=4,
                                                 interpret=True)
np.testing.assert_array_equal(np.asarray(got_shift), np.asarray(want_shift))
# states may only differ on padding frames; compare within true lengths
for b in range(bs):
    t = int(in_lens[b])
    np.testing.assert_array_equal(np.asarray(got_states)[b, :t],
                                  np.asarray(want_states)[b, :t])
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
