"""CassNATTask: CASS-NAT training + ESA decoding driver.

(reference: src/tasks/cassnat_task.py — AST-encoder init w/ optional freeze,
multi-group MulNoam optimizer splitting pretrained encoder vs fresh decoder,
SpecAug scheduling by epoch, sample_topk on for train / off for valid, decode
types ctc_only / esa_att / oracle hitrate stats, utt2diff dumps.)
"""

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cassnat_asr_public_tpu.models import make_cassnat, make_conformer, \
    make_lm, make_transformer
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import checkpoint as ckpt
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.decoding import (
    ctc_greedy_decode_jit,
    nat_decode_jit,
)
from cassnat_asr_public_tpu.utils.schedules import get_mul_optim, get_optim

ENCODER_SUBTREES = ("src_embed", "encoder", "ctc_generator",
                    "interctc_generator")


class CassNATTask(BaseTask):
    model_name = "cassnat"

    def set_model(self, args):
        self.model = make_cassnat(args.input_size, args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        feats = jnp.zeros((2, 16, args.input_size))
        mask = jnp.ones((2, 16), bool)
        lbl = jnp.ones((2, 5), jnp.int32)
        ls = jnp.ones((2,), jnp.int32)
        params = self.model.init(
            {"params": rng, "dropout": rng, "sample": rng}, feats, mask,
            lbl, ls, deterministic=False)
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        """Multi-group optimizer: pretrained encoder slower/frozen vs fresh
        decoder (reference: cassnat_task.py:133-154)."""
        if isinstance(getattr(args, "noam_factor", None), (list, tuple)):
            def label_fn(params):
                def label_of(path):
                    top = path[0].key if hasattr(path[0], "key") else path[0]
                    # The params tree nests under 'params'
                    if top == "params" and len(path) > 1:
                        top = path[1].key if hasattr(path[1], "key") \
                            else path[1]
                    return "encoder" if top in ENCODER_SUBTREES else "decoder"
                return jax.tree_util.tree_map_with_path(
                    lambda p, _: label_of(p), params)
            self.optimizer = get_mul_optim(
                args.optim_type, ("encoder", "decoder"), label_fn, args)
        else:
            self.optimizer = get_optim(args.optim_type, args)
        accum = getattr(args, "accum_grad", 1)
        if accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, accum)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def load_pretrained_model(self, args):
        """AST checkpoint -> encoder subtrees only
        (reference: cassnat_task.py:62-83)."""
        state = ckpt.load_checkpoint(args.resume_model)
        self.state.params = ckpt.transplant_subtrees(
            self.state.params, state["params"], ENCODER_SUBTREES)
        if self.rank == 0:
            print(f"Initialized encoder from {args.resume_model}", flush=True)

    def on_epoch_start(self, epoch, args):
        """SpecAug scheduling (reference: cassnat_task.py:172)."""
        start = getattr(args, "specaug_start_epoch", 0)
        self.train_loader.dataset.use_specaug = (
            epoch >= start and getattr(args, "use_specaug", False))

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        sample_topk = getattr(self.args, "sample_topk", 0) if train else 0
        return self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], sample_topk=sample_topk,
            deterministic=not train, rngs=rngs if train else {})

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_loss=M.AverageMeter("CtcLoss", ":.4e"),
                 att_loss=M.AverageMeter("AttLoss", ":.4e"),
                 ctc_wer=M.AverageMeter("CtcWer", ":.4f"),
                 att_wer=M.AverageMeter("AttWer", ":.4f"))
        return m

    def metric_update(self, out, batch, meters):
        tgt_label = batch["labels"][:, 1:]
        tokens = int((tgt_label != 0).sum())
        meters["loss"].update(float(out["loss"]), tokens)
        meters["ctc_loss"].update(float(out["ctc_loss"]), tokens)
        meters["att_loss"].update(float(out["att_loss"]), tokens)
        feat_sizes = np.asarray(out["feat_sizes"])
        errs, total = M.ctc_greedy_wer(np.asarray(out["ctc_out"]), tgt_label,
                                       feat_sizes)
        meters["ctc_wer"].update(errs / total, total)
        errs, total = M.att_greedy_wer(np.asarray(out["att_out"]), tgt_label)
        meters["att_wer"].update(errs / total, total)

    def epoch_metric(self, valid_meters):
        return valid_meters["att_wer"].avg

    # ---- decoding (reference: cassnat_task.py:307-377) ----
    def load_lm_model(self, args):
        """Rank model: 'lm' (transformer LM) or 'at_baseline' (AST decoder).

        (reference: cassnat_task.py:85-131; kenlm n-gram ranking is
        config-gated out — no kenlm in this image.)
        """
        rank_model = getattr(args, "rank_model", "none")
        if rank_model == "lm" and getattr(args, "lm_config", None):
            from cassnat_asr_public_tpu.utils.config import merge_configs
            lm_args = merge_configs(None, args.lm_config)
            lm_args.vocab_size = args.vocab_size
            self.lm_model = make_lm(lm_args)
            self.lm_params = self.lm_model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
            lm_path = getattr(args, "rnnlm", None)
            if lm_path and os.path.exists(lm_path):
                state = ckpt.load_checkpoint(lm_path)
                self.lm_params = ckpt.restore_params(self.lm_params,
                                                     state["params"])

    def decode(self, args):
        decode_type = getattr(args, "decode_type", "esa_att")
        sample_num = getattr(args, "sample_num", 0) or 1
        rank_model = getattr(args, "rank_model", "none")
        if self.lm_model is None:
            rank_model = "none"
        results = {}
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        lm_apply = (lambda p, ys: self.lm_model.apply(p, ys)) \
            if self.lm_model is not None else None
        t0 = time.time()
        for batch in self.test_loader:
            feats = jnp.asarray(batch["feats"])
            mask = jnp.asarray(batch["src_mask"])
            if decode_type == "ctc_only":
                out = ctc_greedy_decode_jit(self.model, self.state.params,
                                            feats, mask)
            else:
                rng, sub = jax.random.split(rng)
                umax = max(8, min(feats.shape[1] // 4 + 1,
                                  getattr(args, "decode_max_tokens", 160)))
                out = nat_decode_jit(
                    self.model, self.state.params, feats, mask, sub,
                    umax=umax, sample_num=sample_num,
                    threshold=getattr(args, "threshold", 0.9),
                    rank_model=rank_model, lm_apply=lm_apply,
                    lm_params=self.lm_params,
                    lm_weight=getattr(args, "lm_weight", 0.0))
            toks = np.asarray(out["tokens"])
            lens = np.asarray(out["lengths"])
            for i, utt in enumerate(batch["utts"]):
                hyp = [int(t) for t in toks[i, :lens[i]] if t > 2]
                results[utt] = self.vocab.decode(hyp)
        elapsed = time.time() - t0
        return results, elapsed
