"""A configured-but-missing LM/ranker checkpoint must fail loudly.

Round-5 regression: exp/lm_big16_hard lost its best_model.ckpt and the
ESA decode silently ranked with a RANDOM-init 16L LM (WER 0.875 -> 2.72
on the hard parity variant, /tmp/hard_revalid.log). The reference
crashes on a bad path (torch.load); the repo loaders now raise
FileNotFoundError instead of random-initializing
(tasks/base.py:load_lm_model, tasks/cassnat_task.py:load_lm_model).
"""
import types

import pytest

from cassnat_asr_public_tpu.tasks.base import BaseTask
from cassnat_asr_public_tpu.tasks.cassnat_task import CassNATTask


def _args(**kw):
    a = types.SimpleNamespace(vocab_size=19, input_size=80)
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def _shell(cls):
    # load_lm_model only writes attributes on self; skip task __init__
    return object.__new__(cls)


def test_fusion_lm_missing_ckpt_raises(tmp_path):
    args = _args(lm_config=None, rnnlm=str(tmp_path / "nope.ckpt"))
    # base loader requires an lm_config to build the LM; give a minimal one
    cfg = tmp_path / "lm.yaml"
    cfg.write_text("model_type: uniLM\nN: 1\nd_model: 8\nd_ff: 16\n"
                   "n_head: 1\ndropout: 0.0\n")
    args.lm_config = str(cfg)
    with pytest.raises(FileNotFoundError, match="fusion LM"):
        BaseTask.load_lm_model(_shell(BaseTask), args)


def test_rank_lm_missing_ckpt_raises(tmp_path):
    cfg = tmp_path / "lm.yaml"
    cfg.write_text("model_type: uniLM\nN: 1\nd_model: 8\nd_ff: 16\n"
                   "n_head: 1\ndropout: 0.0\n")
    args = _args(rank_model="lm", lm_config=str(cfg),
                 rnnlm=str(tmp_path / "gone.ckpt"))
    with pytest.raises(FileNotFoundError, match="rank LM"):
        CassNATTask.load_lm_model(_shell(CassNATTask), args)
