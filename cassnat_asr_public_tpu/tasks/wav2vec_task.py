"""Wav2vecTask: SSL pretraining on fbank features.

(reference: src/tasks/wav2vec_task.py — SSL crop-collate loader, Wav2vecLoss,
dict-of-logs averaging.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from cassnat_asr_public_tpu.data.audio_loader import SSLCropLoader
from cassnat_asr_public_tpu.data.datasets import SpeechDataset
from cassnat_asr_public_tpu.models.wav2vec import make_model as make_wav2vec
from cassnat_asr_public_tpu.tasks.base import BaseTask, TrainState
from cassnat_asr_public_tpu.utils import metrics as M


class Wav2vecTask(BaseTask):
    model_name = "wav2vec"

    def set_model(self, args):
        self.model = make_wav2vec(args.input_size, args)
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        rngs = {"params": rng, "mask": rng, "negatives": rng, "gumbel": rng,
                "dropout": rng}
        params = self.model.init(
            rngs, jnp.zeros((2, 64, args.input_size)),
            jnp.ones((2, 64), bool), 0, deterministic=False)
        self.state = TrainState(params, None)

    def set_optimizer(self, args):
        super().set_optimizer(args)
        self.state.opt_state = self.optimizer.init(self.state.params)

    def set_dataloader(self, args):
        train_ds = SpeechDataset(self.vocab, args.train_paths, args)
        dev_ds = SpeechDataset(self.vocab, args.dev_paths, args)
        if getattr(args, "use_cmvn", False) and getattr(args, "global_cmvn",
                                                        None):
            train_ds.load_cmvn(args.global_cmvn)
            dev_ds.load_cmvn(args.global_cmvn)
        self.train_loader = SSLCropLoader(train_ds, args.batch_size,
                                          shuffle=True,
                                          shard=(self.rank, self.world))
        self.valid_loader = SSLCropLoader(dev_ds, args.batch_size,
                                          shuffle=False,
                                          shard=(self.rank, self.world))

    def set_test_dataloader(self, args):
        self.set_dataloader(args)

    def build_steps(self):
        optimizer = self.optimizer
        model = self.model
        import optax

        @jax.jit
        def train_step(params, opt_state, batch, rng, num_updates):
            rngs = {"mask": jax.random.fold_in(rng, 0),
                    "negatives": jax.random.fold_in(rng, 1),
                    "gumbel": jax.random.fold_in(rng, 2),
                    "dropout": jax.random.fold_in(rng, 3)}

            def lf(p):
                out = model.apply(p, batch["feats"], batch["src_mask"],
                                  num_updates, deterministic=False, rngs=rngs)
                return out["loss"], out

            (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, out

        @jax.jit
        def eval_step(params, batch, rng, num_updates):
            rngs = {"mask": jax.random.fold_in(rng, 0),
                    "negatives": jax.random.fold_in(rng, 1),
                    "gumbel": jax.random.fold_in(rng, 2)}
            return model.apply(params, batch["feats"], batch["src_mask"],
                               num_updates, deterministic=True, rngs=rngs)

        self._train_step = train_step
        self._eval_step = eval_step

    def make_meters(self):
        m = super().make_meters()
        m.update(acc=M.AverageMeter("Acc", ":.4f"),
                 code_ppl=M.AverageMeter("CodePPL", ":.1f"))
        return m

    def run_one_epoch(self, epoch, args, is_train=True):
        loader = self.train_loader if is_train else self.valid_loader
        meters = self.make_meters()
        rng = jax.random.PRNGKey(getattr(args, "seed", 0) * 997 + epoch)
        import time
        t_end = time.time()
        for i, batch in enumerate(loader):
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k != "utts"}
            if is_train:
                rng, sub = jax.random.split(rng)
                self.state.params, self.state.opt_state, out = \
                    self._train_step(self.state.params, self.state.opt_state,
                                     dev, sub, self.state.step)
                self.state.step += 1
            else:
                out = self._eval_step(self.state.params, dev, rng,
                                      self.state.step)
            n = int(out.get("sample_size", 1))
            meters["loss"].update(float(out["loss"]), n)
            meters["acc"].update(float(out["accuracy"]), n)
            if "code_perplexity" in out:
                meters["code_ppl"].update(float(out["code_perplexity"]), 1)
            meters["time"].update(time.time() - t_end)
            t_end = time.time()
            if i % getattr(args, "print_freq", 100) == 0 and self.rank == 0:
                print(f"[{epoch}][{i}] loss {meters['loss'].avg:.4f} "
                      f"acc {meters['acc'].avg:.4f}", flush=True)
        return meters

    def epoch_metric(self, valid_meters):
        return valid_meters["loss"].avg
