"""ArtTask: AST (transformer/conformer) training + decoding driver.

(reference: src/tasks/art_task.py — hybrid CTC+attention epoch loop with
greedy-WER metrics, decode dispatch ctc_only/ctc_att/ctc_correct.)
"""

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.models import (
    make_conformer,
    make_lm,
    make_transformer,
)
from cassnat_asr_public_tpu.tasks.base import BaseTask
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils import checkpoint as ckpt
from cassnat_asr_public_tpu.utils.decoding import (
    ar_beam_decode_cached_jit,
    ar_beam_decode_jit,
    ctc_correct_decode_jit,
    ctc_greedy_decode_jit,
)


class ArtTask(BaseTask):
    model_name = "art"

    def set_model(self, args):
        input_size = args.input_size
        if getattr(args, "model_type", "transformer") == "conformer" or \
                getattr(args, "use_conv_enc", False):
            self.model = make_conformer(input_size, args)
        else:
            self.model = make_transformer(input_size, args)
        # init params on a fixed tiny shape
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        feats = jnp.zeros((2, 16, input_size))
        mask = jnp.ones((2, 16), bool)
        tgt = jnp.ones((2, 4), jnp.int32)
        lbl = jnp.ones((2, 4), jnp.int32)
        ls = jnp.ones((2,), jnp.int32)
        params = self.model.init({"params": rng, "dropout": rng},
                                 feats, mask, tgt, lbl, ls,
                                 deterministic=False)
        from cassnat_asr_public_tpu.tasks.base import TrainState
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def loss_fn(self, params, batch, rngs, train: bool):
        labels = batch["labels"]
        tgt, tgt_label = labels[:, :-1], labels[:, 1:]
        out = self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt, tgt_label,
            batch["label_sizes"], label_smooth=batch.get("ls"),
            deterministic=not train, rngs=rngs if train else {})
        return self.attach_wer_metrics(out, batch)

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_loss=M.AverageMeter("CtcLoss", ":.4e"),
                 att_loss=M.AverageMeter("AttLoss", ":.4e"),
                 ctc_wer=M.AverageMeter("CtcWer", ":.4f"),
                 att_wer=M.AverageMeter("AttWer", ":.4f"))
        return m

    metric_keys = ("ctc_loss", "att_loss", "ctc_errs", "ctc_tokens",
                   "att_errs", "att_tokens")

    def epoch_metric(self, valid_meters):
        m = valid_meters["att_wer"]
        return m.avg if m.count else float("inf")

    # ---- decoding (reference: art_task.py:233-277) ----
    # load_lm_model inherited from BaseTask (transformer fusion LM)

    def decode_batch(self, args, bd, rng=None):
        """Decode ONE padded batch dict; returns (out, rng). Shared by the
        offline decode loop and the serving driver (bin/serve_asr.py)."""
        decode_type = getattr(args, "decode_type", "ctc_att")
        use_lm = (self.lm_model is not None
                  and getattr(args, "lm_weight", 0) > 0)
        lm_apply = self.lm_apply2 if use_lm else None
        feats = bd["feats"]
        mask = bd["src_mask"]
        if decode_type == "ctc_only":
            out = ctc_greedy_decode_jit(self.model, self.state.params,
                                        feats, mask)
        elif decode_type == "ctc_correct":
            # CTC-correction single-pass decode, then per-position beam
            # when beam_width > 1 (reference: transformer.py:243-342)
            out = ctc_correct_decode_jit(
                self.model, self.state.params, feats, mask,
                umax=feats.shape[1] // 4 + 2,
                lm_apply=self.lm_apply4 if use_lm else None,
                lm_params=self.lm_params,
                lm_weight=getattr(args, "lm_weight", 0.0),
                beam_width=getattr(args, "beam_width", 1),
                lm_model=self.lm_model if use_lm else None)
        else:
            max_steps = min(
                int(getattr(args, "max_decode_ratio", 0)
                    * feats.shape[1] / 4) or feats.shape[1] // 4,
                feats.shape[1] // 4 + 8)
            cached = getattr(args, "use_kv_cache", True)
            beam_fn = ar_beam_decode_cached_jit if cached \
                else ar_beam_decode_jit
            extra = {}
            if cached and use_lm:
                # cached path advances the fusion LM by its own KV cache
                extra = {"lm_model": self.lm_model}
            out = beam_fn(
                self.model, self.state.params, feats, mask,
                beam_width=getattr(args, "beam_width", 20),
                ctc_beam=getattr(args, "ctc_beam", 30),
                ctc_weight=getattr(args, "ctc_weight", 0.4),
                lm_weight=getattr(args, "lm_weight", 0.0),
                length_penalty=getattr(args, "length_penalty", 0.0) or 0.0,
                max_steps=max_steps,
                lm_apply=lm_apply, lm_params=self.lm_params,
                temperature=getattr(args, "T", 1.0), **extra)
        return out, rng

    def decode(self, args):
        results = {}
        t0 = time.time()
        for batch in self.test_loader:
            bd = self.shard_decode_batch(batch)
            out, _ = self.decode_batch(args, bd)
            toks = np.asarray(out["tokens"])
            for i, utt in enumerate(batch["utts"]):
                hyp = [int(t) for t in toks[i] if t > 2]
                results[utt] = self.vocab.decode(hyp)
        elapsed = time.time() - t0
        return results, elapsed
