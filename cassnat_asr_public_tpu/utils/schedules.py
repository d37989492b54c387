"""LR schedules + optimizer factories on optax.

Parity surface with the reference scheduler zoo
(reference: src/utils/optimizer.py):
  - noam ("noam_warmup" / "custom_exp" / "custom_linear" warmup types)
  - multi-group noam with per-group factors / warmups / freeze_steps
    (MulNoamOpt — used to train a fresh CASS-NAT decoder faster than a
    pretrained encoder, reference: optimizer.py:128-174)
  - cosine, multistep (warm/hold/decay/keep), and plain Adam ("normal")

All schedules are pure step->scale functions; the optimizer is
optax.adam(b1=0.9, b2=0.98) matching the reference's Adam hyperparams
(reference: optimizer.py:228). Multi-group scheduling uses
optax.multi_transform over a param-tree label function.
"""

import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def noam_schedule(factor: float, d_model: int, warmup_steps: int,
                  total_steps: int = 250000,
                  warmup_type: str = "noam_warmup") -> Callable:
    """The reference's three noam flavors (reference: optimizer.py:104-117)."""

    def rate(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        if warmup_type == "noam_warmup":
            r = warmup_steps ** 0.5 * jnp.minimum(
                step ** -0.5, step * warmup_steps ** -1.5)
        else:
            c = d_model ** -0.5
            warm = c * step * warmup_steps ** -1.5
            if warmup_type == "custom_exp":
                post = c * step ** -0.5
            elif warmup_type == "custom_linear":
                base = c * warmup_steps ** -0.5
                decay = 1 - (step - warmup_steps) / (total_steps - warmup_steps)
                post = base * jnp.maximum(decay, 0.0)
            else:
                raise ValueError(warmup_type)
            r = jnp.where(step <= warmup_steps, warm, post)
        return factor * r

    return rate


def cosine_schedule(total: int, warmup: int) -> Callable:
    """(reference: optimizer.py:176-193)"""

    def rate(step):
        s = step.astype(jnp.float32)
        return 0.5 * (jnp.cos(jnp.pi * (s - warmup) / total) + 1)

    return rate


def multistep_schedule(decay_rate: float, s_warm: int, s_decay: int,
                       s_keep: int) -> Callable:
    """warm -> hold -> exponential decay -> keep (reference: optimizer.py:195-223)."""

    def rate(step):
        s = step.astype(jnp.float32)
        warm = s / s_warm
        decay = decay_rate ** ((s - s_decay) / (s_keep - s_decay))
        r = jnp.where(s <= s_warm, warm,
                      jnp.where(s <= s_decay, 1.0,
                                jnp.where(s <= s_keep, decay, decay_rate)))
        return r

    return rate


def _schedule_from_args(optim_type: str, args, factor=None, warmup=None):
    if optim_type == "noam":
        return noam_schedule(
            factor if factor is not None else args.noam_factor,
            args.d_model,
            warmup if warmup is not None else args.warmup_steps,
            getattr(args, "total_steps", 250000),
            getattr(args, "warmup_type", "noam_warmup"))
    if optim_type == "cosine":
        base = args.learning_rate
        cos = cosine_schedule(args.cosine_total, args.cosine_warmup)
        return lambda step: base * cos(step)
    if optim_type == "multistep":
        base = args.learning_rate
        ms = multistep_schedule(args.decay_rate, args.s_warm, args.s_decay,
                                args.s_keep)
        return lambda step: base * ms(step)
    if optim_type == "normal":
        return lambda step: jnp.asarray(args.learning_rate, jnp.float32)
    raise NotImplementedError(optim_type)


def _adam(schedule, args):
    eps = getattr(args, "eps", 1e-9)
    wd = getattr(args, "weight_decay", 0.0) or 0.0
    grad_clip = getattr(args, "grad_clip", 0.0) or 0.0
    chain = []
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if wd > 0:
        # Exclude the frozen sinusoidal rel-PE tables (*/pos_enc/table):
        # they are held out of the gradient via stop_gradient, but weight
        # decay would still shrink them toward zero (ADVICE r2).
        def decay_mask(params):
            def keep(path, _):
                keys = tuple(str(k.key) if hasattr(k, "key") else str(k)
                             for k in path)
                return not (len(keys) >= 2 and keys[-2:] ==
                            ("pos_enc", "table"))
            return jax.tree_util.tree_map_with_path(keep, params)
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.98, eps=eps))
    chain.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*chain)


def get_optim(optim_type: str, args) -> optax.GradientTransformation:
    """Single-group optimizer (reference: optimizer.py:225-245)."""
    return _adam(_schedule_from_args(optim_type, args), args)


def get_mul_optim(optim_type: str, group_labels: Sequence[str],
                  label_fn: Callable, args) -> optax.GradientTransformation:
    """Multi-group noam with per-group factor/warmup/freeze_steps.

    group_labels: ordered names, one per group; label_fn maps the param tree
    to a tree of those labels (optax.multi_transform convention).
    args.noam_factor / warmup_steps / freeze_steps are lists, one entry per
    group (reference: optimizer.py:128-174, 247-263).
    """
    assert optim_type == "noam", "multi-group scheduling is noam-only"
    factors = list(args.noam_factor)
    warmups = list(args.warmup_steps)
    freezes = list(args.freeze_steps) if isinstance(
        args.freeze_steps, (list, tuple)) else [args.freeze_steps] * len(factors)
    assert len(factors) == len(group_labels)

    transforms = {}
    for name, f, w, fz in zip(group_labels, factors, warmups, freezes):
        base = noam_schedule(f, args.d_model, w,
                             getattr(args, "total_steps", 250000),
                             getattr(args, "warmup_type", "noam_warmup"))
        if fz and fz > 0:
            sched = (lambda b, z: lambda s: jnp.where(s < z, 0.0, b(s)))(base, fz)
        else:
            sched = base
        transforms[name] = _adam(sched, args)
    return optax.multi_transform(transforms, label_fn)
