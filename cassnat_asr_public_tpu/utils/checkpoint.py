"""Checkpointing: last/best/per-epoch artifacts, averaging, model surgery.

Mirrors the reference artifacts (reference: src/tasks/art_task.py:128-147 —
model.last.mdl / model.N.mdl / best_model.mdl; utils/average_checkpoints.py —
averaged.mdl over the last K epochs) on flax msgpack serialization. Cross-model
surgery (AST encoder -> CASS-NAT init with optional freeze; reference:
cassnat_task.py:62-83) is a param-tree subtree copy.
"""

import os
import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    step: int = 0, extra: Optional[dict] = None):
    state = {
        "params": serialization.to_state_dict(params),
        "epoch": epoch,
        "step": step,
    }
    if opt_state is not None:
        state["opt_state"] = serialization.to_state_dict(opt_state)
    if extra:
        state["extra"] = extra
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, state)))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_params(template, state_dict):
    """Restore a raw state dict onto a params pytree template."""
    return serialization.from_state_dict(template, state_dict)


def average_checkpoints(paths: Sequence[str]) -> Dict:
    """Uniform weight averaging (reference: utils/average_checkpoints.py:11-49)."""
    assert paths
    acc = None
    for p in paths:
        ck = load_checkpoint(p)["params"]
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), ck)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), acc, ck)
    n = len(paths)
    return jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32), acc)


def find_epoch_checkpoints(exp_dir: str, last_n: Optional[int] = None
                           ) -> List[str]:
    pat = re.compile(r"model\.(\d+)\.ckpt$")
    found = []
    for name in os.listdir(exp_dir):
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), os.path.join(exp_dir, name)))
    found.sort()
    paths = [p for _, p in found]
    return paths[-last_n:] if last_n else paths


def transplant_subtrees(dst_params: Dict, src_params: Dict,
                        subtrees: Sequence[str]) -> Dict:
    """Copy named top-level submodules from src into dst (model surgery).

    E.g. subtrees=('src_embed', 'encoder', 'ctc_generator',
    'interctc_generator') for AST -> CASS-NAT encoder init
    (reference: cassnat_task.py:62-83).
    """
    dst = serialization.to_state_dict(dst_params)
    src = serialization.to_state_dict(src_params)

    def copy_into(d, s):
        out = dict(d)
        for k, v in s.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = copy_into(out[k], v)
            elif k in out:
                out[k] = v
        return out

    d_inner = dst["params"] if "params" in dst else dst
    s_inner = src["params"] if "params" in src else src
    for name in subtrees:
        if name in s_inner and name in d_inner:
            d_inner[name] = copy_into(d_inner[name], s_inner[name])
    return serialization.from_state_dict(dst_params, dst)
