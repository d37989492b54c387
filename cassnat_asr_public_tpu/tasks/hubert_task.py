"""HubertTask: HubertNAT fine-tuning from a fairseq HuBERT checkpoint.

(reference: src/tasks/hubert_task.py — fairseq checkpoint load with key
remapping into hub_base.*, raw-audio loaders, NAT decoder training; ESA
decode via run_hubert.sh.)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cassnat_asr_public_tpu.data.audio_loader import HubertDataset, \
    HubertLoader
from cassnat_asr_public_tpu.models.hubert import (
    load_fairseq_hubert,
    make_model as make_hubert,
)
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import metrics as M


class HubertTask(BaseTask):
    model_name = "hubert"

    def set_model(self, args):
        self.model = make_hubert(args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        params = self.model.init(
            {"params": rng}, jnp.zeros((1, 4000)), jnp.asarray([4000]),
            jnp.ones((1, 5), jnp.int32), jnp.asarray([3]))
        self.state = TrainState(params, None)

    # pretrained encoder vs fresh NAT decoder param groups for MulNoam
    # (reference: hubert_task.py:167-188 — src_embed/encoder/ctc_generator
    # are the transplanted fairseq stack; here that stack is `hub_base`)
    ENCODER_SUBTREES = ("hub_base", "ctc_generator")

    def set_optimizer(self, args):
        if getattr(args, "multi_optim", False) and isinstance(
                getattr(args, "noam_factor", None), (list, tuple)):
            from cassnat_asr_public_tpu.utils.schedules import get_mul_optim

            subtrees = self.ENCODER_SUBTREES

            def label_fn(params):
                def label_of(path):
                    top = path[0].key if hasattr(path[0], "key") else path[0]
                    if top == "params" and len(path) > 1:
                        top = path[1].key if hasattr(path[1], "key") \
                            else path[1]
                    return "encoder" if top in subtrees else "decoder"
                return jax.tree_util.tree_map_with_path(
                    lambda p, _: label_of(p), params)

            self.optimizer = get_mul_optim(
                args.optim_type, ("encoder", "decoder"), label_fn, args)
            accum = getattr(args, "accum_grad", 1)
            if accum > 1:
                self.optimizer = optax.MultiSteps(self.optimizer, accum)
        else:
            super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def load_pretrained_model(self, args):
        """fairseq .pt -> hub_base.*, gated by init_encoder
        (reference: hubert_task.py:70-117)."""
        if not getattr(args, "init_encoder", True):
            return
        path = args.resume_model
        if path.endswith(".pt"):
            self.state.params = load_fairseq_hubert(path, self.state.params)
            if self.rank == 0:
                print(f"Imported fairseq HuBERT from {path}", flush=True)
        else:
            super().load_pretrained_model(args)

    def set_dataloader(self, args):
        train_ds = HubertDataset(self.vocab, args.train_paths, args)
        dev_ds = HubertDataset(self.vocab, args.dev_paths, args)
        self.train_loader = HubertLoader(train_ds, shuffle=True,
                                         shard=(self.rank, self.world))
        self.valid_loader = HubertLoader(dev_ds, shuffle=False,
                                         shard=(self.rank, self.world))

    def set_test_dataloader(self, args):
        test_ds = HubertDataset(self.vocab, args.test_paths, args)
        self.test_loader = HubertLoader(test_ds, shuffle=False)

    def loss_fn(self, params, batch, rngs, train: bool):
        tgt_label = batch["labels"][:, 1:]
        sample_topk = getattr(self.args, "sample_topk", 0) if train else 0
        out = self.model.apply(
            params, batch["wavs"], batch["wav_lens"], tgt_label,
            batch["label_sizes"], sample_topk=sample_topk,
            deterministic=not train, rngs=rngs if train else {})
        return self.attach_wer_metrics(out, batch)

    def build_steps(self):
        optimizer = self.optimizer
        loss_fn = self.loss_fn

        @jax.jit
        def train_step(params, opt_state, batch, rng, lr_scale):
            rngs = {"dropout": rng, "sample": jax.random.fold_in(rng, 1),
                    "layerdrop": jax.random.fold_in(rng, 2),
                    "mask": jax.random.fold_in(rng, 3)}

            def lf(p):
                out = loss_fn(p, batch, rngs, train=True)
                return out["loss"], out

            (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, out

        @jax.jit
        def eval_step(params, batch):
            return loss_fn(params, batch, {}, train=False)

        self.train_step = train_step
        self.eval_step = eval_step

    def make_meters(self):
        m = super().make_meters()
        m.update(ctc_wer=M.AverageMeter("CtcWer", ":.4f"),
                 att_wer=M.AverageMeter("AttWer", ":.4f"))
        return m

    metric_keys = ("ctc_errs", "ctc_tokens", "att_errs", "att_tokens")

    def epoch_metric(self, valid_meters):
        m = valid_meters["att_wer"]
        return m.avg if m.count else float("inf")

    def decode_batch(self, args, bd, rng):
        """Decode ONE padded raw-waveform batch: greedy best-path
        (default) or ESA sampling + ranking (reference run_hubert.sh
        decode stage: decode_type esa_att, sample_num 50, threshold 0.9
        + rank model; the rank flavor here is the transformer-LM ranker).

        Routed through the shared `nat_decode_jit` with the waveforms
        standing in for feats — HubertNAT.encode_ctc(wav, wav_lengths)
        has the same positional shape as encode_ctc(feats, src_mask),
        and after encoding everything operates on (enc_h, enc_mask).
        Shared with the serving driver (bin/serve_asr.py), like the
        other ASR tasks' decode_batch.
        """
        from cassnat_asr_public_tpu.nn.hubert_frontend import \
            conv_out_length
        from cassnat_asr_public_tpu.utils.decoding import nat_decode_jit
        wavs = bd["wavs"]
        lens = bd["wav_lens"]
        sample_num = getattr(args, "sample_num", 0) or 1
        if getattr(args, "decode_type", "best_path") != "esa_att":
            sample_num = 1
        rank_model = getattr(args, "rank_model", "none")
        if self.lm_model is None or sample_num == 1:
            rank_model = "none"
        tmax = conv_out_length(int(wavs.shape[1]), self.model.conv_layers)
        umax = max(8, min(tmax // 2 + 2,
                          getattr(args, "decode_max_tokens", 160)))
        rng, sub = jax.random.split(rng)
        out = nat_decode_jit(
            self.model, self.state.params, wavs, lens, sub, umax=umax,
            sample_num=sample_num,
            threshold=getattr(args, "threshold", 0.9),
            rank_model=rank_model,
            lm_apply=getattr(self, "lm_apply4", None),
            lm_params=self.lm_params,
            esa_topk=getattr(args, "esa_topk", 0),
            rank_topm=getattr(args, "esa_rank_topm", 0))
        return out, rng

    def decode(self, args):
        results = {}
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        t0 = time.time()
        for batch in self.test_loader:
            bd = self.shard_decode_batch(batch)
            out, rng = self.decode_batch(args, bd, rng)
            toks = np.asarray(out["tokens"])
            lens_np = np.asarray(out["lengths"])
            for i, utt in enumerate(batch["utts"]):
                hyp = [int(t) for t in toks[i, :max(lens_np[i], 0)]
                       if t > 2]
                results[utt] = self.vocab.decode(hyp)
        return results, time.time() - t0
