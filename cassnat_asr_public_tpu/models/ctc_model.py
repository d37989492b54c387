"""CTC-only acoustic model with optional causal (uni-directional) masking.

(reference: src/models/ctc_model.py — encoder + CTC head, fwd/bwd causal
src-mask variants, greedy decode, beam decode w/ optional LM.)
"""

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.nn.blocks import ConEncoder, TrfEncoder
from cassnat_asr_public_tpu.nn.modules import ConvEmbedding, Generator
from cassnat_asr_public_tpu.ops.ctc import ctc_greedy_collapse, ctc_loss


class CTCModel(nn.Module):
    input_size: int
    vocab_size: int
    n_enc: int = 12
    d_model: int = 512
    d_encff: int = 1024
    n_head: int = 8
    dropout: float = 0.1
    use_conv_enc: bool = True
    enc_kernel_size: int = 31
    enc_max_relative_len: int = 20
    pos_type: str = "relative"
    share_ff: bool = False
    ctc_alpha: float = 1.0
    interctc_alpha: float = 0.0
    interctc_layer: int = 0
    causal: str = "none"  # "none" | "forward" | "backward"
    padding_idx: int = 0
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        if self.use_conv_enc:
            self.src_embed = ConvEmbedding(
                self.input_size, self.d_model, self.dropout,
                pos_type="relative",
                max_relative_len=self.enc_max_relative_len,
                causal=(self.causal == "forward"),
                compute_dtype=self.compute_dtype, name="src_embed")
            self.encoder = ConEncoder(
                self.d_model, self.n_head, self.d_encff, self.enc_kernel_size,
                self.n_enc, self.dropout, pos_type="relative",
                share_ff=self.share_ff, compute_dtype=self.compute_dtype,
                remat=self.remat, name="encoder")
        else:
            self.src_embed = ConvEmbedding(
                self.input_size, self.d_model, self.dropout,
                pos_type="absolute", causal=(self.causal == "forward"),
                compute_dtype=self.compute_dtype, name="src_embed")
            self.encoder = TrfEncoder(
                self.d_model, self.n_head, self.d_encff, self.n_enc,
                self.dropout, compute_dtype=self.compute_dtype,
                remat=self.remat, name="encoder")
        self.ctc_generator = Generator(self.vocab_size,
                                       compute_dtype=self.compute_dtype,
                                       name="ctc_generator")
        if self.interctc_alpha > 0:
            self.interctc_generator = Generator(
                self.vocab_size, add_norm=True,
                compute_dtype=self.compute_dtype, name="interctc_generator")

    def _enc_attn_mask(self, enc_mask):
        """Padding mask combined with an optional uni-directional mask.

        "forward" = lower-triangular (no future), "backward" =
        upper-triangular (reference: ctc_model.py:106-114 get_causal_mask).
        """
        t = enc_mask.shape[1]
        m = enc_mask[:, None, :]
        if self.causal == "forward":
            m = m & jnp.tril(jnp.ones((t, t), bool))[None]
        elif self.causal == "backward":
            m = m & jnp.triu(jnp.ones((t, t), bool))[None]
        return m

    def encode_ctc(self, src, src_mask):
        x, enc_mask = self.src_embed(src, src_mask, deterministic=True)
        enc_h, _ = self.encoder(x, self._enc_attn_mask(enc_mask),
                                interctc_layer=0, deterministic=True)
        return enc_h, enc_mask, self.ctc_generator(enc_h)

    def __call__(self, src, src_mask, tgt_label, label_sizes,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        x, enc_mask = self.src_embed(src, src_mask,
                                     deterministic=deterministic)
        enc_h, inter_h = self.encoder(
            x, self._enc_attn_mask(enc_mask),
            interctc_layer=self.interctc_layer
            if self.interctc_alpha > 0 else 0, deterministic=deterministic)
        feat_sizes = enc_mask.sum(-1)
        ctc_out = self.ctc_generator(enc_h)
        loss = jnp.zeros(())
        out = {"ctc_out": ctc_out, "feat_sizes": feat_sizes}
        ctc_l = ctc_loss(ctc_out, tgt_label, feat_sizes, label_sizes,
                         blank=self.padding_idx)
        out["ctc_loss"] = ctc_l
        loss = loss + self.ctc_alpha * ctc_l
        if self.interctc_alpha > 0:
            inter_out = self.interctc_generator(inter_h)
            inter_l = ctc_loss(inter_out, tgt_label, feat_sizes, label_sizes,
                               blank=self.padding_idx)
            out["interctc_loss"] = inter_l
            loss = loss + self.interctc_alpha * inter_l
        out["loss"] = loss
        return out

    def greedy_decode(self, src, src_mask):
        """Collapsed greedy decode (reference: ctc_model.py:116-138)."""
        _, enc_mask, ctc_out = self.encode_ctc(src, src_mask)
        return ctc_greedy_collapse(ctc_out, enc_mask, blank=self.padding_idx)


def make_model(input_size: int, args) -> CTCModel:
    """(reference: src/models/ctc_model.py:20-45)"""
    return CTCModel(
        input_size=input_size,
        vocab_size=args.vocab_size,
        n_enc=args.N_enc,
        d_model=args.d_model,
        d_encff=getattr(args, "d_encff", 1024),
        n_head=args.n_head,
        dropout=args.dropout,
        use_conv_enc=getattr(args, "use_conv_enc", True),
        enc_kernel_size=getattr(args, "enc_kernel_size", 31),
        enc_max_relative_len=getattr(args, "enc_max_relative_len", 20),
        pos_type=getattr(args, "pos_type", "relative"),
        share_ff=getattr(args, "share_ff", False),
        ctc_alpha=getattr(args, "ctc_alpha", 1.0),
        interctc_alpha=getattr(args, "interctc_alpha", 0.0),
        interctc_layer=getattr(args, "interctc_layer", 0),
        causal=getattr(args, "causal", "none"),
        padding_idx=getattr(args, "padding_idx", 0),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
        remat=getattr(args, "remat", False),
    )
