"""AST-Conformer: conformer encoder + transformer decoder.

(reference: src/models/conformer.py — Conformer(Transformer) with a ConEncoder
and relative positional encoding; decoder unchanged.)
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.models.transformer import Transformer
from cassnat_asr_public_tpu.nn.blocks import ConEncoder, TrfDecoder, TrfEncoder
from cassnat_asr_public_tpu.nn.modules import (
    ConvEmbedding,
    Generator,
    PositionalEncoding,
    TextEmbedding,
    swish,
)


class Conformer(Transformer):
    """Same training/decoding surface as Transformer; conformer encoder.

    pos_type 'relative' threads a Transformer-XL relative table from the
    ConvEmbedding through every encoder layer
    (reference: src/models/conformer.py:18-64).
    """
    d_encff: int = 1024
    d_decff: int = 1024
    kernel_size: int = 31
    pos_type: str = "relative"
    max_relative_len: int = 20
    share_ff: bool = False

    def setup(self):
        self.src_embed = ConvEmbedding(
            self.input_size, self.d_model, self.dropout,
            pos_type=self.pos_type, max_relative_len=self.max_relative_len,
            compute_dtype=self.compute_dtype, name="src_embed")
        self.encoder = ConEncoder(
            self.d_model, self.n_head, self.d_encff, self.kernel_size,
            self.n_enc, self.dropout, pos_type=self.pos_type,
            share_ff=self.share_ff, compute_dtype=self.compute_dtype,
            remat=self.remat, name="encoder")
        self.tgt_embed = TextEmbedding(self.vocab_size, self.d_model,
                                       name="tgt_embed")
        self.tgt_pos = PositionalEncoding(self.d_model, self.dropout,
                                          name="tgt_pos")
        # reference conformer.py:32 builds the (transformer) decoder FFN with
        # Swish at width d_decff, unlike the plain-transformer decoder's
        # relu at d_ff
        self.decoder = TrfDecoder(
            self.d_model, self.n_head, self.d_decff, self.n_dec, self.dropout,
            compute_dtype=self.compute_dtype, remat=self.remat,
            activation=swish, name="decoder")
        self.ctc_generator = Generator(self.vocab_size,
                                       compute_dtype=self.compute_dtype,
                                       name="ctc_generator")
        self.att_generator = Generator(self.vocab_size,
                                       compute_dtype=self.compute_dtype,
                                       name="att_generator")
        if self.interctc_alpha > 0:
            self.interctc_generator = Generator(
                self.vocab_size, add_norm=True,
                compute_dtype=self.compute_dtype, name="interctc_generator")

    def encode(self, src, src_mask, deterministic=True):
        x, enc_mask = self.src_embed(src, src_mask, deterministic=deterministic)
        attn_mask = enc_mask[:, None, :]
        enc_h, inter_h = self.encoder(
            x, attn_mask, interctc_layer=self.interctc_layer
            if self.interctc_alpha > 0 else 0, deterministic=deterministic)
        return enc_h, enc_mask, inter_h


def make_model(input_size: int, args) -> Conformer:
    """(reference: src/models/conformer.py:18-46)"""
    return Conformer(
        input_size=input_size,
        vocab_size=args.vocab_size,
        n_enc=args.N_enc,
        n_dec=args.N_dec,
        d_model=args.d_model,
        d_ff=args.d_ff,
        d_encff=getattr(args, "d_encff", 1024),
        d_decff=getattr(args, "d_decff", args.d_ff),
        kernel_size=getattr(args, "enc_kernel_size", 31),
        pos_type=getattr(args, "pos_type", "relative"),
        max_relative_len=getattr(args, "enc_max_relative_len", 20),
        share_ff=getattr(args, "share_ff", False),
        n_head=args.n_head,
        dropout=args.dropout,
        ctc_alpha=args.ctc_alpha,
        interctc_alpha=getattr(args, "interctc_alpha", 0.0),
        interctc_layer=getattr(args, "interctc_layer", 0),
        label_smooth=getattr(args, "label_smooth", 0.1),
        padding_idx=getattr(args, "padding_idx", 0),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
        remat=getattr(args, "remat", False),
    )
