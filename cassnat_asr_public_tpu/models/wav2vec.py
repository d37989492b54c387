"""wav2vec2-style SSL pretraining on fbank features.

(reference: src/models/wav2vec_model.py — ConvEmbedding frontend, span
masking with a learned mask embedding, Gumbel-VQ targets, same-utterance
negative sampling, cosine InfoNCE + diversity loss; loss assembly
src/utils/loss.py:92-190 Wav2vecLoss.)

Static-shape JAX version: span count and target count M are computed
statically; gathers are fixed-size (ops/ssl.py).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.nn.blocks import ConEncoder, TrfEncoder
from cassnat_asr_public_tpu.nn.gumbel_vq import GumbelVectorQuantizer
from cassnat_asr_public_tpu.nn.modules import ConvEmbedding
from cassnat_asr_public_tpu.ops.ssl import (
    compute_span_mask,
    gather_fixed_count,
    infonce_logits,
    num_mask_spans,
    sample_negatives,
)


class Wav2vec2(nn.Module):
    input_size: int
    model_type: str = "transformer"
    n_enc: int = 12
    d_model: int = 512
    d_ff: int = 2048
    d_encff: int = 1024
    n_head: int = 8
    dropout: float = 0.1
    enc_kernel_size: int = 31
    enc_max_relative_len: int = 20
    pos_type: str = "absolute"
    share_ff: bool = False
    # ssl params (reference: wav2vec yaml surface)
    mask_prob: float = 0.65
    mask_length: int = 10
    # channel masking (reference: wav2vec_model.py apply_mask:258-275)
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    num_negatives: int = 100
    # negative-sampling variants (reference: wav2vec_model.py:141-172)
    negatives_from_everywhere: bool = False
    codebook_negatives: int = 0
    logit_temp: float = 0.1
    final_dim: int = 256
    quantize_targets: bool = True
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0
    latent_temp: tuple = (2.0, 0.5, 0.999995)
    loss_weights: tuple = (0.1,)  # diversity
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    compute_dtype: Any = jnp.float32

    def setup(self):
        pos = "relative" if (self.model_type == "conformer"
                             and self.pos_type == "relative") else "absolute"
        self.src_embed = ConvEmbedding(
            self.input_size, self.d_model, self.dropout, pos_type=pos,
            max_relative_len=self.enc_max_relative_len,
            compute_dtype=self.compute_dtype, name="src_embed")
        if self.model_type == "conformer":
            self.encoder = ConEncoder(
                self.d_model, self.n_head, self.d_encff,
                self.enc_kernel_size, self.n_enc, self.dropout,
                pos_type=pos, share_ff=self.share_ff,
                compute_dtype=self.compute_dtype, name="encoder")
        else:
            self.encoder = TrfEncoder(
                self.d_model, self.n_head, self.d_ff, self.n_enc,
                self.dropout, compute_dtype=self.compute_dtype,
                name="encoder")
        vq_dim = self.latent_dim if self.latent_dim > 0 else self.final_dim
        if self.quantize_targets:
            self.quantizer = GumbelVectorQuantizer(
                dim=self.d_model, num_vars=self.latent_vars,
                groups=self.latent_groups, vq_dim=vq_dim,
                temp_max=self.latent_temp[0], temp_min=self.latent_temp[1],
                temp_decay=self.latent_temp[2], name="quantizer")
            self.project_q = nn.Dense(self.final_dim, name="project_q")
        else:
            self.quantizer = None
            self.project_q = nn.Dense(self.final_dim, name="project_q")
        self.mask_embed = self.param(
            "mask_embed", nn.initializers.uniform(scale=1.0), (self.d_model,))
        self.final_proj = nn.Dense(self.final_dim, name="final_proj")
        self.drop_in = nn.Dropout(self.dropout_input)
        self.drop_feat = nn.Dropout(self.dropout_features)

    def __call__(self, src, src_mask, num_updates, mask: bool = True,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        features, feat_mask = self.src_embed(src, src_mask,
                                             deterministic=deterministic)
        if isinstance(features, tuple):
            features, pos_embed = features
        else:
            pos_embed = None
        lengths = feat_mask.sum(-1)
        tmax = feat_mask.shape[1]

        unmasked = self.drop_feat(features, deterministic=deterministic)
        x = self.drop_in(features, deterministic=deterministic)

        n_spans = num_mask_spans(tmax, self.mask_prob, self.mask_length)
        m_count = min(tmax, n_spans * self.mask_length)
        if mask:
            span_rng = self.make_rng("mask")
            mask_idx = compute_span_mask(span_rng, lengths, tmax, n_spans,
                                         self.mask_length)
            x = jnp.where(mask_idx[..., None],
                          self.mask_embed.astype(x.dtype), x)
            if self.mask_channel_prob > 0:
                # channel spans zeroed across all frames
                # (reference: wav2vec_model.py apply_mask:258-275)
                c = x.shape[-1]
                n_cspans = num_mask_spans(c, self.mask_channel_prob,
                                          self.mask_channel_length)
                cspan = compute_span_mask(
                    self.make_rng("mask"),
                    jnp.full((x.shape[0],), c, jnp.int32), c, n_cspans,
                    self.mask_channel_length)
                x = jnp.where(cspan[:, None, :], 0.0, x)
            y, y_valid = gather_fixed_count(unmasked, mask_idx, m_count)
        else:
            mask_idx = feat_mask
            y, y_valid = unmasked, feat_mask

        enc_in = (x, pos_embed) if pos_embed is not None else x
        enc_out, _ = self.encoder(enc_in, feat_mask[:, None, :],
                                  interctc_layer=0,
                                  deterministic=deterministic)

        out = {"mask_indices": mask_idx}
        neg_rng = self.make_rng("negatives")
        if self.quantizer is not None:
            if self.negatives_from_everywhere:
                # quantize ALL frames; negatives drawn from the full
                # sequence, positives gathered at the masked positions
                # (reference: wav2vec_model.py:141-152)
                q = self.quantizer(unmasked, num_updates,
                                   train=not deterministic)
                y_full = self.project_q(q["x"])  # (B, T, D)
                y_t, _ = gather_fixed_count(y_full, mask_idx, m_count)
                negs = sample_negatives(neg_rng, y_t, self.num_negatives,
                                        pool=y_full)
            else:
                q = self.quantizer(y, num_updates, train=not deterministic)
                y_t = self.project_q(q["x"])
                negs = sample_negatives(neg_rng, y_t, self.num_negatives)
            out.update(prob_perplexity=q["prob_perplexity"],
                       code_perplexity=q["code_perplexity"],
                       num_vars=q["num_vars"], temp=q["temp"])
            if self.codebook_negatives > 0:
                # extra negatives drawn uniformly from the codebook
                # (reference: wav2vec_model.py:163-168)
                cb_rng = self.make_rng("codebook")
                bsz, msz = y_t.shape[0], y_t.shape[1]
                cb = self.quantizer.sample_from_codebook(
                    cb_rng, bsz * msz, self.codebook_negatives)
                cb = cb.reshape(bsz, msz, self.codebook_negatives, -1) \
                    .transpose(2, 0, 1, 3)  # (K, B, M, vq_dim)
                negs = jnp.concatenate([negs, self.project_q(cb)], axis=0)
        else:
            if self.negatives_from_everywhere:
                negs = self.project_q(sample_negatives(
                    neg_rng, y, self.num_negatives, pool=unmasked))
                y_t = self.project_q(y)
            else:
                y_t = self.project_q(y)
                negs = sample_negatives(neg_rng, y_t, self.num_negatives)

        xm, _ = gather_fixed_count(enc_out, mask_idx, m_count)
        xp = self.final_proj(xm)
        logits = infonce_logits(xp, y_t, negs, self.logit_temp)  # (1+N,B,M)

        # InfoNCE: target class is index 0 (reference: loss.py:107-117).
        logp = jax.nn.log_softmax(logits, axis=0)
        valid = y_valid if mask else jnp.ones(logits.shape[1:], bool)
        nll = -jnp.where(valid, logp[0], 0.0)
        sample_size = jnp.maximum(valid.sum(), 1)
        contrastive = nll.sum() / sample_size

        loss = contrastive
        if self.quantizer is not None and self.loss_weights:
            div = (out["num_vars"] - out["prob_perplexity"]) / out["num_vars"]
            loss = loss + self.loss_weights[0] * div
            out["diversity_loss"] = div

        # accuracy diagnostics (reference: loss.py:169-187)
        pred_correct = (logits.argmax(0) == 0) & valid
        out.update(loss=loss, contrastive_loss=contrastive,
                   accuracy=pred_correct.sum() / sample_size,
                   sample_size=sample_size)
        return out


def make_model(input_size: int, args) -> Wav2vec2:
    """(reference: src/models/wav2vec_model.py:21-52)"""
    return Wav2vec2(
        input_size=input_size,
        model_type=getattr(args, "model_type", "transformer"),
        n_enc=args.N_enc,
        d_model=args.d_model,
        d_ff=args.d_ff,
        d_encff=getattr(args, "d_encff", 1024),
        n_head=args.n_head,
        dropout=args.dropout,
        enc_kernel_size=getattr(args, "enc_kernel_size", 31),
        enc_max_relative_len=getattr(args, "enc_max_relative_len", 20),
        pos_type=getattr(args, "pos_type", "absolute"),
        share_ff=getattr(args, "share_ff", False),
        mask_prob=getattr(args, "mask_prob", 0.65),
        mask_length=getattr(args, "mask_length", 10),
        mask_channel_prob=getattr(args, "mask_channel_prob", 0.0),
        mask_channel_length=getattr(args, "mask_channel_length", 10),
        num_negatives=getattr(args, "num_negatives", 100),
        negatives_from_everywhere=getattr(args, "negatives_from_everywhere",
                                          False),
        codebook_negatives=getattr(args, "codebook_negatives", 0),
        logit_temp=getattr(args, "logit_temp", 0.1),
        final_dim=getattr(args, "final_dim", 256),
        quantize_targets=getattr(args, "quantize_targets", True),
        latent_vars=getattr(args, "latent_vars", 320),
        latent_groups=getattr(args, "latent_groups", 2),
        latent_dim=getattr(args, "latent_dim", 0),
        latent_temp=tuple(getattr(args, "latent_temp", (2.0, 0.5, 0.999995))),
        loss_weights=tuple(getattr(args, "loss_weights", (0.1,))),
        dropout_input=getattr(args, "dropout_input", 0.1),
        dropout_features=getattr(args, "dropout_features", 0.1),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
    )
