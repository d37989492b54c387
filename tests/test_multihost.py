"""Real multi-process multi-host execution on CPU (2 processes x 4 devices).

Exercises the actual multi-host stack end-to-end — `distributed_init` env
plumbing (WORLD_SIZE/RANK/MASTER_ADDR), global mesh over non-addressable
devices, `shard_batch`'s make_array_from_process_local_data assembly, and a
jitted computation whose collectives run over Gloo — asserting both
processes produce the single-process result. (ADVICE r1 flagged multi-host
as untestable; this is the test.)
"""

import os
import socket
import subprocess
import sys

WORKER = r"""
import os, sys
rank = int(os.environ["RANK"])
from cassnat_asr_public_tpu.parallel.mesh import (distributed_init,
                                                  make_mesh, shard_batch)
distributed_init()
import jax
import jax.numpy as jnp
import numpy as np
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
mesh = make_mesh()
assert mesh.shape["data"] == 8
full = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
local = full[rank * 4:(rank + 1) * 4]
batch = shard_batch({"x": local, "scale": np.float32(0.5)}, mesh)

@jax.jit
def step(d):
    return (d["x"] * d["scale"]).sum(), (d["x"] ** 2).mean()

tot, sq = step(batch)
want_tot = float((full * 0.5).sum())
want_sq = float((full ** 2).mean())
assert abs(float(tot) - want_tot) < 1e-4, (float(tot), want_tot)
assert abs(float(sq) - want_sq) < 1e-4, (float(sq), want_sq)
print(f"rank{rank} MH_OK {float(tot)}", flush=True)
"""


def test_two_process_multihost_cpu():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = dict(os.environ)
    base["JAX_PLATFORMS"] = "cpu"
    base["XLA_FLAGS"] = (base.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=4").strip()
    base.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    base.pop("PALLAS_AXON_POOL_IPS", None)
    parts = [p for p in base.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    base["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    base["WORLD_SIZE"] = "2"
    base["MASTER_ADDR"] = "127.0.0.1"
    base["MASTER_PORT"] = str(port)
    procs = []
    for rank in range(2):
        env = dict(base)
        env["RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, (rank, out[-1500:], err[-3000:])
        assert f"rank{rank} MH_OK" in out, (rank, out[-500:])
