"""AST: autoregressive speech transformer with hybrid CTC+attention training.

TPU-native re-design of the reference AST (reference: src/models/transformer.py).
The training forward is a single jittable function computing
  loss = att_loss + ctc_alpha * ctc_loss (+ interctc_alpha * interctc_loss)
(reference: transformer.py:74-104). Decode paths live in
cassnat_asr_public_tpu/utils/decoding.py as batched, fixed-beam scans rather
than the reference's Python hypothesis lists (transformer.py:122-241).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.nn.blocks import TrfDecoder, TrfEncoder
from cassnat_asr_public_tpu.nn.modules import (
    ConvEmbedding,
    Generator,
    PositionalEncoding,
    TextEmbedding,
)
from cassnat_asr_public_tpu.ops.ctc import ctc_loss
from cassnat_asr_public_tpu.utils.losses import label_smoothing_loss


def causal_mask(size: int) -> jnp.ndarray:
    """(1, size, size) lower-triangular bool (reference: transformer.py:118-120)."""
    return jnp.tril(jnp.ones((size, size), bool))[None]


class Transformer(nn.Module):
    """Hybrid CTC/attention AST.

    Pipeline: ConvEmbedding -> TrfEncoder -> (CTC head || TextEmbedding+PE ->
    TrfDecoder -> att head) (reference: transformer.py:54-104).
    """
    input_size: int
    vocab_size: int
    n_enc: int = 12
    n_dec: int = 6
    d_model: int = 512
    d_ff: int = 2048
    n_head: int = 8
    dropout: float = 0.1
    ctc_alpha: float = 1.0
    interctc_alpha: float = 0.0
    interctc_layer: int = 0
    label_smooth: float = 0.1
    padding_idx: int = 0
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        self.src_embed = ConvEmbedding(
            self.input_size, self.d_model, self.dropout, pos_type="absolute",
            compute_dtype=self.compute_dtype, name="src_embed")
        self.encoder = TrfEncoder(
            self.d_model, self.n_head, self.d_ff, self.n_enc, self.dropout,
            compute_dtype=self.compute_dtype, remat=self.remat, name="encoder")
        self.tgt_embed = TextEmbedding(self.vocab_size, self.d_model,
                                       name="tgt_embed")
        self.tgt_pos = PositionalEncoding(self.d_model, self.dropout,
                                          name="tgt_pos")
        self.decoder = TrfDecoder(
            self.d_model, self.n_head, self.d_ff, self.n_dec, self.dropout,
            compute_dtype=self.compute_dtype, remat=self.remat, name="decoder")
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
        """src (B,T,F), src_mask (B,T) bool -> enc_h, enc_mask, inter_h."""
        x, enc_mask = self.src_embed(src, src_mask, deterministic=deterministic)
        attn_mask = enc_mask[:, None, :]  # (B, 1, T')
        enc_h, inter_h = self.encoder(
            x, attn_mask, interctc_layer=self.interctc_layer
            if self.interctc_alpha > 0 else 0, deterministic=deterministic)
        return enc_h, enc_mask, inter_h

    def decode_states(self, enc_h, enc_mask, tgt, tgt_mask, deterministic=True):
        y = self.tgt_pos(self.tgt_embed(tgt), deterministic=deterministic)
        return self.decoder(y, enc_h, enc_mask[:, None, :], tgt_mask,
                            deterministic=deterministic)

    def __call__(self, src, src_mask, tgt, tgt_label, label_sizes,
                 label_smooth: Optional[float] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Training/validation forward.

        src: (B, T, F) padded features; src_mask: (B, T) bool;
        tgt: (B, U) decoder input (sos-prefixed); tgt_label: (B, U) shifted
        targets (eos-terminated); label_sizes: (B,) token counts excl sos/eos.
        """
        enc_h, enc_mask, inter_h = self.encode(src, src_mask, deterministic)
        feat_sizes = enc_mask.sum(-1)

        out = {}
        ctc_out = self.ctc_generator(enc_h)
        out["ctc_out"] = ctc_out
        loss = 0.0
        if self.ctc_alpha > 0:
            ctc_l = ctc_loss(ctc_out, tgt_label, feat_sizes, label_sizes,
                             blank=self.padding_idx)
            out["ctc_loss"] = ctc_l
            loss = loss + self.ctc_alpha * ctc_l
        else:
            out["ctc_loss"] = jnp.zeros(())
        if self.interctc_alpha > 0:
            inter_out = self.interctc_generator(inter_h)
            inter_l = ctc_loss(inter_out, tgt_label, feat_sizes, label_sizes,
                               blank=self.padding_idx)
            out["interctc_loss"] = inter_l
            loss = loss + self.interctc_alpha * inter_l

        umax = tgt.shape[1]
        pad_mask = (tgt != self.padding_idx)[:, None, :]
        tgt_mask = pad_mask & causal_mask(umax)
        dec_h = self.decode_states(enc_h, enc_mask, tgt, tgt_mask,
                                   deterministic)
        att_out = self.att_generator(dec_h)
        smooth = self.label_smooth if label_smooth is None else label_smooth
        att_l = label_smoothing_loss(att_out, tgt_label, self.vocab_size,
                                     self.padding_idx, smooth)
        out["att_out"] = att_out
        out["att_loss"] = att_l
        out["loss"] = loss + att_l
        out["feat_sizes"] = feat_sizes
        return out

    # ---- decode-time helpers (jitted from utils/decoding.py) ----

    def encode_ctc(self, src, src_mask):
        """Encoder + CTC head, eval mode (decode entry)."""
        enc_h, enc_mask, _ = self.encode(src, src_mask, deterministic=True)
        return enc_h, enc_mask, self.ctc_generator(enc_h)

    def decoder_logprobs(self, enc_h, enc_mask, ys, temperature: float = 1.0):
        """Log-probs over the next token for each prefix in `ys`.

        ys: (N, L) sos-prefixed prefixes (padding_idx-padded). Returns
        (N, V) log-softmax of the last valid position. Used by the batched
        beam search (reference re-runs the decoder per step with no KV cache,
        transformer.py:188; we do the same full-prefix recompute but batched
        over beams — encoder states dominate, and L is short).
        """
        pad_mask = (ys != self.padding_idx)[:, None, :]
        tgt_mask = pad_mask & causal_mask(ys.shape[1])
        dec_h = self.decode_states(enc_h, enc_mask, ys, tgt_mask)
        lengths = (ys != self.padding_idx).sum(-1)
        last = jnp.take_along_axis(
            dec_h, (lengths - 1)[:, None, None], axis=1)[:, 0]
        return self.att_generator(last, temperature)

    # ---- KV-cached incremental decoding (improves on the reference's
    # cache-less AST decode, transformer.py:188) ----

    def init_decode_state(self, enc_h, batch: int, max_len: int):
        """(cross_kvs, self_cache) for `decoder_step`."""
        return (self.decoder.precompute_cross(enc_h),
                self.decoder.init_cache(batch, max_len))

    def decoder_step(self, tok, pos, cache, cross_kvs, enc_mask,
                     temperature: float = 1.0):
        """Next-token log-probs from one new token.

        tok: (B,) current input token; pos: scalar write index.
        Returns ((B, V) log-probs, new self cache).
        """
        from cassnat_asr_public_tpu.nn.modules import \
            sinusoidal_position_encoding
        y = self.tgt_embed(tok[:, None])
        pe = jnp.asarray(sinusoidal_position_encoding(5000, self.d_model))
        y = y + jax.lax.dynamic_slice_in_dim(pe, pos, 1, axis=0)[None] \
            .astype(y.dtype)
        h, cache = self.decoder.step(y, cache, pos, cross_kvs, enc_mask)
        return self.att_generator(h[:, 0], temperature), cache

    def forward_att_scores(self, enc_h, enc_mask, ys):
        """Per-position log-probs for rescoring (reference: transformer.py:106-116
        returns softmax; we return log-softmax and let callers exp)."""
        pad_mask = (ys != self.padding_idx)[:, None, :]
        tgt_mask = pad_mask & causal_mask(ys.shape[1])
        dec_h = self.decode_states(enc_h, enc_mask, ys, tgt_mask)
        return self.att_generator(dec_h)


def make_model(input_size: int, args) -> Transformer:
    """Factory mirroring the reference surface (reference: transformer.py:19-37)."""
    return Transformer(
        input_size=input_size,
        vocab_size=args.vocab_size,
        n_enc=args.N_enc,
        n_dec=args.N_dec,
        d_model=args.d_model,
        d_ff=args.d_ff,
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
