"""Config system: CLI + train YAML + data YAML flattened onto one namespace.

Mirrors the reference's three-way merge (reference: src/bin/train_asr.py:42-66)
and the SpecAug sub-config object (train_asr.py:68-74). The resolved config is
persisted to exp_dir/config.yaml as JSON for reproducibility.
"""

import json
import os
from types import SimpleNamespace

import yaml


class Config(SimpleNamespace):
    """Attribute-style config with dict-merge and .get()."""

    def get(self, key, default=None):
        return getattr(self, key, default)

    def update(self, d):
        for k, v in d.items():
            setattr(self, k, v)
        return self

    def to_dict(self):
        out = {}
        for k, v in vars(self).items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    @classmethod
    def from_dict(cls, d):
        c = cls()
        for k, v in d.items():
            setattr(c, k, cls.from_dict(v) if isinstance(v, dict) else v)
        return c


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f) or {}


def merge_configs(cli_args=None, train_config=None, data_config=None):
    """Flatten CLI flags + train YAML + data YAML onto one Config.

    Later sources override earlier ones: CLI flags are applied first, then
    train YAML, then data YAML — so YAML values WIN over CLI flags for keys
    present in both. This matches the reference resolution order
    (train_asr.py:42-62 sets YAML values as attributes of the argparse
    namespace, overwriting any same-named CLI flag).
    """
    cfg = Config()
    if cli_args is not None:
        src = vars(cli_args) if not isinstance(cli_args, dict) else cli_args
        cfg.update(src)
    for path_or_dict in (train_config, data_config):
        if path_or_dict is None:
            continue
        d = path_or_dict if isinstance(path_or_dict, dict) else load_yaml(path_or_dict)
        for k, v in d.items():
            setattr(cfg, k, Config.from_dict(v) if isinstance(v, dict) else v)
    # SpecAug sub-config object (reference: train_asr.py:68-74).
    if hasattr(cfg, "spec_aug") and isinstance(cfg.spec_aug, dict):
        cfg.specaug_conf = Config.from_dict(cfg.spec_aug)
    elif hasattr(cfg, "spec_aug"):
        cfg.specaug_conf = cfg.spec_aug
    # YAML spells compute_dtype as a string; resolve to a jnp dtype.
    if isinstance(getattr(cfg, "compute_dtype", None), str):
        import jax.numpy as jnp
        cfg.compute_dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[cfg.compute_dtype]
    return cfg


def dump_config(cfg: Config, exp_dir: str):
    """Persist the resolved config (reference: train_asr.py:64-66)."""
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, "config.yaml")
    with open(path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)
    return path
