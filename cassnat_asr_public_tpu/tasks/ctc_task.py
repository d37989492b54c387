"""CTCTask: CTC-only training + greedy/beam decoding.

(reference: src/tasks/ctc_task.py)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.models import make_ctc_model
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.decoding import (
    ctc_frame_beam_decode,
    ctc_greedy_decode_jit,
)


class CTCTask(BaseTask):
    model_name = "ctc"

    def set_model(self, args):
        self.model = make_ctc_model(args.input_size, args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        params = self.model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 16, args.input_size)), jnp.ones((2, 16), bool),
            jnp.ones((2, 4), jnp.int32), jnp.ones((2,), jnp.int32),
            deterministic=False)
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        out = self.model.apply(
            params, batch["feats"], batch["src_mask"], tgt_label,
            batch["label_sizes"], deterministic=not train,
            rngs=rngs if train else {})
        return self.attach_wer_metrics(out, batch, att=False)

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_wer=M.AverageMeter("CtcWer", ":.4f"))
        return m

    def metric_stage(self, out, batch):
        s = super().metric_stage(out, batch)
        for k in ("ctc_errs", "ctc_tokens"):
            if k in out:
                s[k] = out[k]
        return s

    def metric_apply(self, vals, meters):
        super().metric_apply(vals, meters)
        if "ctc_errs" in vals:
            t = max(int(vals["ctc_tokens"]), 1)
            meters["ctc_wer"].update(int(vals["ctc_errs"]) / t, t)

    def epoch_metric(self, valid_meters):
        return valid_meters["ctc_wer"].avg

    def decode(self, args):
        decode_type = getattr(args, "decode_type", "greedy")
        results = {}
        t0 = time.time()
        for batch in self.test_loader:
            bd = self.shard_decode_batch(batch)
            feats = bd["feats"]
            mask = bd["src_mask"]
            if decode_type in ("greedy", "ctc_only"):
                out = ctc_greedy_decode_jit(self.model, self.state.params,
                                            feats, mask)
                toks, lens = np.asarray(out["tokens"]), \
                    np.asarray(out["lengths"])
                hyps = [list(toks[i, :lens[i]]) for i in range(len(lens))]
            else:  # beam
                _, enc_mask, ctc_out = self.model.apply(
                    self.state.params, feats, mask, method="encode_ctc")
                lm_w = getattr(args, "ctc_lm_weight", 0.0)
                from cassnat_asr_public_tpu.models.lm import TransformerLM
                fusion_lm = self.lm_model if isinstance(
                    self.lm_model, TransformerLM) else None
                if lm_w > 0 and fusion_lm is None:
                    # host fallback for non-transformer LM scorers
                    feat_sizes = np.asarray(enc_mask.sum(-1))
                    hyps = ctc_frame_beam_decode(
                        np.asarray(ctc_out), feat_sizes,
                        beam_width=getattr(args, "ctc_beam", 10),
                        pruning_size=getattr(args, "ctc_pruning", 10) or 10,
                        lm_weight=lm_w,
                        length_penalty=getattr(args, "ctc_lp", 0.0) or 0.0)
                else:
                    # device beam; with lm_w > 0 the fusion LM advances
                    # in-graph through its KV cache (reference:
                    # beam_decode.py:31-55 batched per-frame LM queries)
                    from cassnat_asr_public_tpu.utils.decoding import \
                        ctc_frame_beam_decode_jit
                    out = ctc_frame_beam_decode_jit(
                        ctc_out, enc_mask.sum(-1),
                        beam_width=getattr(args, "ctc_beam", 10),
                        pruning_size=getattr(args, "ctc_pruning", 10) or 10,
                        length_penalty=getattr(args, "ctc_lp", 0.0) or 0.0,
                        lm_model=fusion_lm if lm_w > 0 else None,
                        lm_params=self.lm_params if lm_w > 0 else None,
                        lm_weight=lm_w)
                    toks = np.asarray(out["tokens"])
                    lens = np.asarray(out["lengths"])
                    hyps = [list(toks[i, 0, :lens[i, 0]])
                            for i in range(toks.shape[0])]
            for i, utt in enumerate(batch["utts"]):
                results[utt] = self.vocab.decode(
                    [int(t) for t in hyps[i] if t > 2])
        return results, time.time() - t0
