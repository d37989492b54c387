"""BaseTask: model/optimizer/dataloader assembly + the jitted SPMD train step.

TPU re-design of the reference task layer (reference: src/tasks/base_task.py):
  - checkpoint-or-pretrained loading with resume of params/opt_state/epoch
    (base_task.py:16-43)
  - parameter counting (base_task.py:56-70)
  - device placement = mesh sharding instead of .cuda()+DDP (base_task.py:72-83)
  - dataloader construction with dataset-type dispatch (base_task.py:85-146)

The train step is a donated, jitted function over a ('data','model') mesh:
batch sharded on 'data', params replicated (or model-sharded), gradient
all-reduce inserted by XLA. Gradient accumulation uses optax.MultiSteps
(reference: accum_grad, art_task.py:211-215).
"""

import math
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cassnat_asr_public_tpu.data.datasets import (
    DynamicDataset,
    SpeechDataLoader,
    SpeechDataset,
)
from cassnat_asr_public_tpu.data.vocab import Vocab
from cassnat_asr_public_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from cassnat_asr_public_tpu.utils import checkpoint as ckpt
from cassnat_asr_public_tpu.utils import metrics as M
from cassnat_asr_public_tpu.utils.schedules import get_optim


class TrainState:
    """Minimal mutable train-state holder (params/opt_state/step live on
    device with mesh shardings)."""

    def __init__(self, params, opt_state, step=0, epoch=0):
        self.params = params
        self.opt_state = opt_state
        self.step = step
        self.epoch = epoch


def count_params(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


class BaseTask:
    model_name = "base"

    def __init__(self, mode: str, args):
        self.mode = mode
        self.args = args
        self.rank = jax.process_index()
        self.world = jax.process_count()
        self.mesh = make_mesh(model=getattr(args, "model_parallel", 1),
                              pipe=getattr(args, "pipeline_parallel", 1))
        if self.mesh.shape.get("model", 1) > 1 \
                or self.mesh.shape.get("pipe", 1) > 1:
            # activate the models' activation-sharding anchors (Megatron
            # pattern: residual stream data-sharded at layer boundaries,
            # GSPMD derives the head-/ff-parallel intermediates) and the
            # encoders' pipelined layer path (GPipe over the 'pipe' axis);
            # pure-DP and single-chip meshes leave constrain_activation a
            # no-op — batch sharding alone propagates fine there
            from cassnat_asr_public_tpu.parallel.mesh import (
                set_global_mesh, set_pipe_microbatches)
            set_global_mesh(self.mesh)
            set_pipe_microbatches(getattr(args, "pp_microbatches", 0))
        self.vocab = Vocab(args.vocab_file) if getattr(
            args, "vocab_file", None) else None
        self.lm_model = None
        self.lm_params = None
        self.start_epoch = 0
        self.lr_scale = 1.0
        self.current_label_smooth = getattr(args, "label_smooth", 0.1)

        self.set_model(args)
        if mode == "train":
            self.set_optimizer(args)
            self.set_dataloader(args)
            self.load_model(args)
            if self.mesh.shape.get("model", 1) > 1:
                self._shard_train_state()
        else:
            self.set_test_dataloader(args)
            self.load_test_model(args)

    # ---- to be provided by subclasses ----
    def set_model(self, args):
        raise NotImplementedError

    def loss_fn(self, params, batch, rngs, train: bool):
        raise NotImplementedError

    # ---- model/optimizer assembly ----
    def init_params(self, args):
        raise NotImplementedError

    def set_optimizer(self, args):
        self.optimizer = get_optim(args.optim_type, args)
        accum = getattr(args, "accum_grad", 1)
        if accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, accum)

    def model_stats(self):
        n = count_params(self.state.params)
        if self.rank == 0:
            print(f"Model has {n/1e6:.2f}M parameters "
                  f"on mesh {dict(self.mesh.shape)}", flush=True)
        return n

    # ---- checkpoint handling (reference: base_task.py:16-54) ----
    def load_model(self, args):
        last = os.path.join(args.exp_dir, "model.last.ckpt")
        if os.path.exists(last):
            state = ckpt.load_checkpoint(last)
            self.state.params = ckpt.restore_params(self.state.params,
                                                    state["params"])
            if "opt_state" in state:
                self.state.opt_state = ckpt.restore_params(
                    self.state.opt_state, state["opt_state"])
            self.start_epoch = int(state.get("epoch", -1)) + 1
            self.state.step = int(state.get("step", 0))
            if self.rank == 0:
                print(f"Resumed from {last} at epoch {self.start_epoch}",
                      flush=True)
        elif getattr(args, "resume_model", ""):
            self.load_pretrained_model(args)
        self.model_stats()

    def _shard_train_state(self):
        """model_parallel > 1 at TRAIN time: place the params on the mesh
        with the Megatron tensor-parallel rules (parallel/mesh.py) and
        re-place the optimizer state to match (template = optimizer.init
        on the placed params — adam moments inherit the param shardings;
        restored values are device_put onto the template's layouts).
        GSPMD propagates these shardings through the jitted train/eval
        steps, so the production driver trains tensor-parallel with no
        per-task changes (TPU-native replacement for the reference's
        DDP-only scaling, SURVEY §2.7)."""
        from cassnat_asr_public_tpu.parallel.mesh import \
            param_sharding_rules
        from cassnat_asr_public_tpu.parallel.mesh import replicated
        rules = param_sharding_rules(self.state.params, self.mesh)
        self.state.params = jax.tree_util.tree_map(
            jax.device_put, self.state.params, rules)
        if self.state.opt_state is not None:
            template = jax.jit(self.optimizer.init)(self.state.params)
            rep = replicated(self.mesh)

            def place(t, v):
                # param-shaped moments inherit the param shardings from
                # init; template leaves that don't span the mesh (e.g.
                # scalar step counters materialized as constants on one
                # device) are replicated instead
                sh = t.sharding
                if len(getattr(sh, "device_set", ())) != self.mesh.size:
                    sh = rep
                return jax.device_put(jnp.asarray(v), sh)

            self.state.opt_state = jax.tree_util.tree_map(
                place, template, self.state.opt_state)
        if self.rank == 0:
            print(f"[tp] train state sharded over "
                  f"model={self.mesh.shape['model']}", flush=True)

    def load_pretrained_model(self, args):
        state = ckpt.load_checkpoint(args.resume_model)
        self.state.params = ckpt.restore_params(self.state.params,
                                                state["params"])
        if self.rank == 0:
            print(f"Loaded pretrained weights from {args.resume_model}",
                  flush=True)

    def load_lm_model(self, args):
        """Default fusion-LM loader: a TransformerLM from lm_config, used
        for shallow fusion in AR/CTC beam decoding (reference:
        art_task.py:67 load_lm_model; subclasses override for rank
        models)."""
        if not getattr(args, "lm_config", None) and not getattr(
                args, "rnnlm", None):
            return
        from cassnat_asr_public_tpu.models import make_lm
        from cassnat_asr_public_tpu.utils.config import merge_configs
        lm_args = merge_configs(None, args.lm_config)
        lm_args.vocab_size = args.vocab_size
        self.lm_model = make_lm(lm_args)
        tokens = jnp.ones((1, 4), jnp.int32)
        self.lm_params = self.lm_model.init(jax.random.PRNGKey(0), tokens)
        lm_path = getattr(args, "rnnlm", None)
        if lm_path:
            if not os.path.exists(lm_path):
                # configured-but-missing fusion LM: fail loudly rather
                # than shallow-fusing a random-init LM (reference
                # torch.load raises on a bad path)
                raise FileNotFoundError(
                    f"fusion LM checkpoint not found: {lm_path}")
            state = ckpt.load_checkpoint(lm_path)
            self.lm_params = ckpt.restore_params(self.lm_params,
                                                 state["params"])
        lm = self.lm_model
        self.lm_apply2 = lambda p, ys: lm.apply(p, ys)
        self.lm_apply4 = lambda p, ys, feats, mask: lm.apply(p, ys)

    def load_test_model(self, args):
        path = getattr(args, "resume_model", "")
        if not path:
            return
        if not os.path.exists(path):
            # decoding with random weights must be impossible to do by
            # accident (the reference would crash in torch.load here;
            # reference: base_task.py:45-54)
            raise FileNotFoundError(
                f"resume_model {path!r} does not exist — refusing to "
                "decode with randomly initialized weights")
        state = ckpt.load_checkpoint(path)
        self.state.params = ckpt.restore_params(self.state.params,
                                                state["params"])
        if self.rank == 0:
            print(f"Loaded test model {path}", flush=True)

    def shard_decode_batch(self, batch) -> Dict:
        """numpy decode batch -> device arrays, sharded over the mesh's
        data axis when more than one device is visible — SPMD batch decode
        is the TPU-native replacement for the reference's nj-sharded
        per-GPU decoding (reference: run_art.sh:108-133 splits the scp and
        runs one process per shard). Single-device meshes pass through.

        The batch dim is padded to a multiple of the data axis by
        REPEATING the last row (well-conditioned inputs; padding rows sit
        at the END so per-utterance output indexing via batch['utts'] is
        unchanged). On first use the params are placed replicated on the
        mesh (or model-sharded when model_parallel > 1)."""
        d = {k: v for k, v in batch.items() if k != "utts"}
        if self.mesh.size == 1:
            return {k: jnp.asarray(v) for k, v in d.items()}
        if not getattr(self, "_decode_params_placed", False):
            if self.mesh.shape.get("model", 1) > 1:
                from cassnat_asr_public_tpu.parallel.mesh import \
                    param_sharding_rules
                rules = param_sharding_rules(self.state.params, self.mesh)
                self.state.params = jax.tree_util.tree_map(
                    jax.device_put, self.state.params, rules)
            else:
                self.state.params = jax.device_put(self.state.params,
                                                   replicated(self.mesh))
            self._decode_params_placed = True
        n_data = self.mesh.shape["data"]
        bs = d["feats"].shape[0] if "feats" in d else \
            next(iter(d.values())).shape[0]
        pad = (-bs) % n_data
        if pad:
            for k, v in d.items():
                v = np.asarray(v)
                if v.ndim >= 1 and v.shape[0] == bs:
                    d[k] = np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)], 0)
        return shard_batch(d, self.mesh)

    def save_checkpoint(self, name: str, epoch: int):
        if self.rank != 0:
            return
        path = os.path.join(self.args.exp_dir, name)
        ckpt.save_checkpoint(path, self.state.params, self.state.opt_state,
                             epoch=epoch, step=self.state.step)

    # ---- data (reference: base_task.py:85-146) ----
    def set_dataloader(self, args):
        ds_type = getattr(args, "dataset_type", "DynamicDataset")
        cls = {"SpeechDataset": SpeechDataset,
               "DynamicDataset": DynamicDataset}[ds_type]
        train_ds = cls(self.vocab, args.train_paths, args)
        dev_args = args
        dev_ds = cls(self.vocab, args.dev_paths, dev_args)
        dev_ds.use_specaug = False
        if getattr(args, "use_cmvn", False) and getattr(args, "global_cmvn", None):
            train_ds.load_cmvn(args.global_cmvn)
            dev_ds.load_cmvn(args.global_cmvn)
        bs = 1 if ds_type == "DynamicDataset" else args.batch_size
        # shape-bucket granularity: larger buckets -> more padding but
        # fewer distinct XLA train-step compiles (each bucket shape is one
        # compile; see CLAUDE.md on the remote compile service)
        fb = getattr(args, "frame_bucket", 64)
        lb = getattr(args, "label_bucket", 8)
        self.train_loader = SpeechDataLoader(
            train_ds, bs, padding_idx=args.padding_idx, shuffle=True,
            shard=(self.rank, self.world), seed=getattr(args, "seed", 0),
            frame_bucket=fb, label_bucket=lb)
        self.valid_loader = SpeechDataLoader(
            dev_ds, bs, padding_idx=args.padding_idx, shuffle=False,
            shard=(self.rank, self.world), augment=False,
            frame_bucket=fb, label_bucket=lb)

    def set_test_dataloader(self, args):
        test_ds = SpeechDataset(self.vocab, args.test_paths, args)
        test_ds.use_specaug = False
        if getattr(args, "use_cmvn", False) and getattr(args, "global_cmvn", None):
            test_ds.load_cmvn(args.global_cmvn)
        self.test_loader = SpeechDataLoader(
            test_ds, getattr(args, "test_batch_size", 8),
            padding_idx=args.padding_idx, shuffle=False, augment=False,
            frame_bucket=getattr(args, "frame_bucket", 64),
            label_bucket=getattr(args, "label_bucket", 8))

    # ---- jitted train/eval steps ----
    def build_steps(self):
        optimizer = self.optimizer
        loss_fn = self.loss_fn

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng, lr_scale):
            def lf(p):
                out = loss_fn(p, batch, {"dropout": rng, "sample": rng},
                              train=True)
                return out["loss"], out

            (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            # runtime LR multiplier: plateau annealing for optim_type
            # 'normal' (reference: ReduceLROnPlateau, art_task.py:95-99)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, out

        @jax.jit
        def eval_step(params, batch):
            return loss_fn(params, batch, {}, train=False)

        self.train_step = train_step
        self.eval_step = eval_step

    # ---- metrics: device-side staging + deferred host flush ----
    # The reference pulls the (B, T', V) logits to host EVERY step for
    # greedy WER (reference: art_task.py:196-202 -> wer.py) — a D2H sync in
    # the hot loop. Here WER error counts are computed in-graph
    # (ops/edit_distance.py) and metric_stage returns only tiny device
    # scalars, which are batched into ONE host transfer per print_freq
    # steps (flush), so the step loop stays fully asynchronous.

    def attach_wer_metrics(self, out: Dict, batch: Dict,
                           ctc: bool = True, att: bool = True) -> Dict:
        """In-graph greedy WER counts; pops the big logits from `out`.

        Call at the end of loss_fn (inside jit)."""
        from cassnat_asr_public_tpu.ops.edit_distance import (
            att_greedy_errors, ctc_greedy_errors)
        tgt = batch["labels"][:, 1:]
        lsz = batch["label_sizes"]
        if ctc and "ctc_out" in out:
            tmax = out["ctc_out"].shape[1]
            fmask = jnp.arange(tmax)[None, :] < out["feat_sizes"][:, None]
            e, t = ctc_greedy_errors(out["ctc_out"], fmask, tgt, lsz)
            out["ctc_errs"], out["ctc_tokens"] = e, t
        if att and "att_out" in out:
            e, t = att_greedy_errors(out["att_out"], tgt, lsz)
            out["att_errs"], out["att_tokens"] = e, t
        for k in ("ctc_out", "att_out", "feat_sizes", "ac_embed",
                  "mapped_embed"):
            out.pop(k, None)
        return out

    # Extra per-step metric payload staged from the model output (each task
    # lists the keys its loss_fn emits): '*_loss' keys update the
    # same-named meter weighted by tokens; '*_errs' keys pair with the
    # matching '*_tokens' count to update the '*_wer' meter.
    metric_keys: Tuple[str, ...] = ()

    def metric_stage(self, out: Dict, batch: Dict) -> Dict:
        """Per-step metric payload: small DEVICE arrays + host ints only.
        Must not force device results (no float()/np.asarray)."""
        s = {"loss": out["loss"],
             "tokens": int((batch["labels"][:, 1:] != 0).sum())}
        for k in self.metric_keys:
            if k in out:
                s[k] = out[k]
        return s

    def metric_apply(self, vals: Dict, meters: Dict):
        """Consume one host-materialized metric payload."""
        meters["loss"].update(float(vals["loss"]), vals["tokens"])
        for k in self.metric_keys:
            if k not in vals:
                continue
            if k.endswith("_loss"):
                meters[k].update(float(vals[k]), vals["tokens"])
            elif k.endswith("_errs"):
                name = k[:-len("_errs")]
                t = max(int(vals[name + "_tokens"]), 1)
                meters[name + "_wer"].update(int(vals[k]) / t, t)

    def _flush_metrics(self, pending, meters):
        if not pending:
            return
        for vals in jax.device_get(pending):
            self.metric_apply(vals, meters)
        pending.clear()

    def epoch_rng(self, args, epoch):
        """Per-epoch root PRNG key for dropout/sampling/layerdrop.

        On TPU this defaults to the hardware RBG generator: the default
        threefry keygen costs ~13 ms/step at the production CASS-NAT
        config (60.2 -> 47.2 ms/step measured,
        benchmarks/dropout_rng_bench.py) purely generating dropout masks.
        RBG bits are not threefry-reproducible across backends but are
        more than adequate for dropout/alignment sampling; set
        `prng_impl: threefry` to force the portable generator.
        """
        impl = getattr(self.args, "prng_impl", None) or \
            ("rbg" if jax.default_backend() == "tpu" else "threefry2x32")
        # accept the docstring's short spelling: jax only knows
        # "threefry2x32" / "rbg" / "unsafe_rbg"
        if impl == "threefry":
            impl = "threefry2x32"
        seed = getattr(args, "seed", 0) * 1000 + epoch
        # typed key: carries the impl through split/fold_in/flax rngs
        return jax.random.key(seed, impl=impl)

    def run_one_epoch(self, epoch, args, is_train=True):
        loader = self.train_loader if is_train else self.valid_loader
        meters = self.make_meters()
        n_batches = len(loader)
        accum = getattr(args, "accum_grad", 1)
        num_updates = math.ceil(n_batches / accum) if is_train else n_batches
        progress = M.ProgressMeter(num_updates, *meters.values(),
                                   prefix=f"Epoch: [{epoch}]")
        rng = self.epoch_rng(args, epoch)
        t_end = time.time()
        pending = []
        for i, batch in enumerate(loader):
            batch_dev = self.prepare_batch(batch)
            if is_train:
                rng, sub = jax.random.split(rng)
                self.state.params, self.state.opt_state, out = \
                    self.train_step(self.state.params, self.state.opt_state,
                                    batch_dev, sub,
                                    jnp.asarray(self.lr_scale, jnp.float32))
                self.state.step += 1
                self.on_train_step(args)
            else:
                out = self.eval_step(self.state.params, batch_dev)
            pending.append(self.metric_stage(out, batch))
            meters["time"].update(time.time() - t_end)
            t_end = time.time()
            if i % getattr(args, "print_freq", 100) == 0 and self.rank == 0:
                self._flush_metrics(pending, meters)
                progress.print(i)
        self._flush_metrics(pending, meters)
        return meters

    def make_meters(self):
        return {
            "time": M.AverageMeter("Time", ":6.3f"),
            "loss": M.AverageMeter("Loss", ":.4e"),
        }

    def prepare_batch(self, batch) -> Dict:
        """numpy batch -> device arrays with batch sharding; runtime
        scalars (current label smoothing) ride along replicated.

        The batch dim is padded to a multiple of the mesh's data axis so
        every shard is non-empty (padding rows have empty masks/labels and
        contribute nothing to losses; WER metrics skip them)."""
        d = {k: v for k, v in batch.items() if k != "utts"}
        unit = self.mesh.shape["data"]
        if self.mesh.shape.get("pipe", 1) > 1:
            # the pipelined encoder needs B divisible by
            # n_microbatches x data shards (parallel/pipeline.py)
            from cassnat_asr_public_tpu.parallel.mesh import pipe_config
            unit *= pipe_config()[2]
        bs = d["labels"].shape[0] if "labels" in d else \
            next(iter(d.values())).shape[0]
        pad = (-bs) % unit
        if pad:
            for k, v in d.items():
                if isinstance(v, np.ndarray) and v.ndim >= 1 \
                        and v.shape[0] == bs:
                    d[k] = np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)], 0)
        d["ls"] = np.float32(self.current_label_smooth)
        return shard_batch(d, self.mesh)

    # ---- epoch loop (reference: art_task.py:95-152) ----
    def run(self, args):
        best_metric = float("inf")
        best_epoch = 0
        patience = getattr(args, "end_patience", 10)
        # valid_freq N: validate/checkpoint every N epochs (and on the
        # final one). The reference validates every epoch; for tiny
        # low-resource epochs (a handful of steps) the per-epoch valid
        # pass + checkpoint host pull dominates wall-clock, so the
        # low-resource recipes raise this (e.g. egs/synth 25-utt arms).
        valid_freq = max(1, int(getattr(args, "valid_freq", 1) or 1))
        self.build_steps()
        for epoch in range(self.start_epoch, args.epochs):
            self.train_loader.set_epoch(epoch)
            self.on_epoch_start(epoch, args)
            train_meters = self.run_one_epoch(epoch, args, is_train=True)
            if (epoch + 1) % valid_freq and epoch < args.epochs - 1:
                continue
            valid_meters = self.run_one_epoch(epoch, args, is_train=False)
            metric = self.epoch_metric(valid_meters)
            self.on_valid_metric(metric, args)
            if self.rank == 0:
                tr = ", ".join(f"Train {k}: {m.avg:.4f}"
                               for k, m in train_meters.items() if k != "time")
                va = ", ".join(f"Valid {k}: {m.avg:.4f}"
                               for k, m in valid_meters.items() if k != "time")
                print(f"Epoch {epoch} done, {tr}, {va}", flush=True)
            self.save_checkpoint("model.last.ckpt", epoch)
            if epoch > getattr(args, "start_saving_epoch", 0):
                self.save_checkpoint(f"model.{epoch}.ckpt", epoch)
            if metric < best_metric:
                best_metric, best_epoch = metric, epoch
                self.save_checkpoint("best_model.ckpt", epoch)
            if epoch + 1 - best_epoch >= patience:
                if self.rank == 0:
                    print("Early stop: no validation improvement", flush=True)
                break

    def on_epoch_start(self, epoch, args):
        pass

    def on_train_step(self, args):
        """Per-update hooks: label-smoothing disable schedule
        (reference: art_task.py:217-220 — zero the smoothing once the
        multistep schedule reaches s_decay when disable_ls is set).

        s_decay counts OPTIMIZER updates in the reference (its step counter
        increments once per accum_grad micro-batches), while self.state.step
        counts micro-batches — so divide by accum_grad before comparing."""
        accum = max(getattr(args, "accum_grad", 1), 1)
        if getattr(args, "disable_ls", False) and \
                self.state.step // accum >= getattr(args, "s_decay", 1 << 60) and \
                self.current_label_smooth != 0.0:
            self.current_label_smooth = 0.0
            if self.rank == 0:
                print("Disable label smoothing from here.", flush=True)

    def on_valid_metric(self, metric, args):
        """Plateau LR annealing for optim_type 'normal'
        (reference: ReduceLROnPlateau, art_task.py:95-99,
        cassnat_task.py:161-164)."""
        if getattr(args, "optim_type", "") != "normal":
            return
        if not hasattr(self, "_plateau_best"):
            self._plateau_best = float("inf")
            self._plateau_wait = 0
        if metric < self._plateau_best - 1e-6:
            self._plateau_best = metric
            self._plateau_wait = 0
            return
        self._plateau_wait += 1
        if self._plateau_wait > getattr(args, "patience", 2):
            ratio = getattr(args, "anneal_lr_ratio", 0.5)
            min_scale = getattr(args, "min_lr", 0.0) / max(
                getattr(args, "learning_rate", 1.0), 1e-12)
            self.lr_scale = max(self.lr_scale * ratio, min_scale)
            self._plateau_wait = 0
            if self.rank == 0:
                print(f"Plateau: LR scale -> {self.lr_scale:.4g}",
                      flush=True)

    def epoch_metric(self, valid_meters) -> float:
        return valid_meters["loss"].avg
