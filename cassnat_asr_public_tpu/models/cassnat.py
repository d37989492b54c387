"""CASS-NAT: CTC-alignment-based single-step non-autoregressive transformer.

TPU-native re-design of the reference model (reference: src/models/cassnat.py).
The full pipeline — encoder, CTC head, Viterbi/best-path alignment, trigger
mask, acoustic-embedding extractor, embedding mapper (SAD), mixed-attention
decoder (MAD) — is one jittable function with static shapes:

  feats -> ConvEmbedding -> Encoder -> ctc_out
        -> alignment (lax.scan Viterbi w/ jittable backtrace | best path)
        -> trigger mask (vectorized cumsum/compare)
        -> PE queries x trigger-masked cross-attn (AcExtra)
        -> self-attn mapper (SAD) -> mixed-attn decoder (MAD) -> att_out

Training loss = ctc_alpha*ctc + interctc_alpha*interctc + att_alpha*att
              + interce_alpha*interce (reference: cassnat.py:228-255).

The ESA decode (sampled alignments + ranking) is a batched single forward —
see utils/decoding.py.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.nn.blocks import (
    ConAcExtra,
    ConEncoder,
    ConMAD,
    ConSAD,
    TrfAcExtra,
    TrfEncoder,
    TrfMAD,
    TrfSAD,
)
from cassnat_asr_public_tpu.nn.modules import (
    ConvEmbedding,
    Generator,
    sinusoidal_position_encoding,
)
from cassnat_asr_public_tpu.ops.ctc import (
    align_to_trigger_mask,
    ctc_best_path_align,
    ctc_loss,
    ctc_viterbi_align,
    expand_trigger_mask,
)
from cassnat_asr_public_tpu.utils.losses import label_smoothing_loss


class CassNAT(nn.Module):
    """See module docstring. Field names follow the reference config surface
    (conf/cassnat_train.yaml)."""
    input_size: int
    vocab_size: int
    n_enc: int = 12
    n_extra: int = 1
    n_self_dec: int = 5
    n_mix_dec: int = 2
    d_model: int = 512
    d_ff: int = 2048
    d_encff: int = 1024
    d_decff: int = 1024
    n_head: int = 8
    dropout: float = 0.1
    # conformer switches (reference: cassnat.py:30-62)
    use_conv_enc: bool = True
    use_conv_dec: bool = True
    enc_kernel_size: int = 31
    dec_kernel_size: int = 3
    enc_max_relative_len: int = 20
    dec_max_relative_len: int = 8
    pos_type: str = "relative"
    share_ff: bool = False
    # NAT specifics
    use_trigger: bool = True
    src_trigger: bool = True
    use_unimask: bool = False
    left_trigger: int = 0
    right_trigger: int = 0
    use_best_path: bool = False
    # losses
    ctc_alpha: float = 1.0
    att_alpha: float = 1.0
    interctc_alpha: float = 0.0
    interctc_layer: int = 0
    interce_alpha: float = 0.0
    interce_layer: int = 0
    label_smooth: float = 0.1
    padding_idx: int = 0
    compute_dtype: Any = jnp.float32
    remat: bool = False
    pe_max_len: int = 5000

    def setup(self):
        if self.use_conv_enc:
            assert self.pos_type == "relative"
            self.src_embed = ConvEmbedding(
                self.input_size, self.d_model, self.dropout,
                pos_type="relative",
                max_relative_len=self.enc_max_relative_len,
                compute_dtype=self.compute_dtype, name="src_embed")
            self.encoder = ConEncoder(
                self.d_model, self.n_head, self.d_encff, self.enc_kernel_size,
                self.n_enc, self.dropout, pos_type="relative",
                share_ff=self.share_ff, compute_dtype=self.compute_dtype,
                remat=self.remat, name="encoder")
        else:
            self.src_embed = ConvEmbedding(
                self.input_size, self.d_model, self.dropout,
                pos_type="absolute", compute_dtype=self.compute_dtype,
                name="src_embed")
            self.encoder = TrfEncoder(
                self.d_model, self.n_head, self.d_encff, self.n_enc,
                self.dropout, compute_dtype=self.compute_dtype,
                remat=self.remat, name="encoder")

        if self.use_conv_dec:
            self.acembed_extractor = ConAcExtra(
                self.d_model, self.n_head, self.d_ff, self.dropout,
                max_relative_len=self.dec_max_relative_len,
                compute_dtype=self.compute_dtype, name="acembed_extractor")
            self.embed_mapper = ConSAD(
                self.d_model, self.n_head, self.d_decff,
                self.dec_kernel_size, self.n_self_dec, self.dropout,
                pos_type="relative", share_ff=self.share_ff,
                max_relative_len=self.dec_max_relative_len,
                compute_dtype=self.compute_dtype, name="embed_mapper")
            self.decoder = ConMAD(
                self.d_model, self.n_head, self.d_decff,
                self.dec_kernel_size, self.n_mix_dec, self.dropout,
                share_ff=self.share_ff, compute_dtype=self.compute_dtype,
                name="decoder")
        else:
            self.acembed_extractor = TrfAcExtra(
                self.d_model, self.n_head, self.d_decff, self.n_extra,
                self.dropout, compute_dtype=self.compute_dtype,
                name="acembed_extractor")
            self.embed_mapper = TrfSAD(
                self.d_model, self.n_head, self.d_decff, self.n_self_dec,
                self.dropout, compute_dtype=self.compute_dtype,
                name="embed_mapper")
            self.decoder = TrfMAD(
                self.d_model, self.n_head, self.d_decff, self.n_mix_dec,
                self.dropout, compute_dtype=self.compute_dtype, name="decoder")

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
        if self.interce_alpha > 0:
            self.interce_generator = Generator(
                self.vocab_size, add_norm=True,
                compute_dtype=self.compute_dtype, name="interce_generator")

    # interCE can tap SAD or MAD depending on interce_layer
    # (reference: cassnat.py:73-83).
    @property
    def _selfce_layer(self):
        if self.interce_alpha > 0 and self.interce_layer <= self.n_self_dec:
            return self.interce_layer
        return 0

    @property
    def _mixce_layer(self):
        if self.interce_alpha > 0 and self.interce_layer > self.n_self_dec:
            return self.interce_layer - self.n_self_dec
        return 0

    def encode(self, src, src_mask, deterministic=True):
        x, enc_mask = self.src_embed(src, src_mask, deterministic=deterministic)
        attn_mask = enc_mask[:, None, :]
        enc_h, inter_h = self.encoder(
            x, attn_mask, interctc_layer=self.interctc_layer
            if self.interctc_alpha > 0 else 0, deterministic=deterministic)
        return enc_h, enc_mask, inter_h

    def encode_ctc(self, src, src_mask):
        enc_h, enc_mask, _ = self.encode(src, src_mask, deterministic=True)
        return enc_h, enc_mask, self.ctc_generator(enc_h)

    def nat_decode_states(self, enc_h, enc_mask, trigger_mask, ylen,
                          umax_plus1, deterministic=True):
        """Alignment-conditioned NAT decoder: trigger mask -> att hidden.

        enc_h: (B, T, D); enc_mask: (B, T) bool; trigger_mask: (B, U+1, T);
        ylen: (B,) token counts incl the EOS slot. Returns
        (dec_h, interce_h or None).
        (reference: cassnat.py:182-226)
        """
        bs = enc_h.shape[0]
        # token-count (bidirectional) mask: positions < ylen
        tgt_mask_bidi = (jnp.arange(umax_plus1)[None, :] < ylen[:, None])
        tgt_mask_b1u = tgt_mask_bidi[:, None, :]  # (B, 1, U+1)

        pe = jnp.asarray(
            sinusoidal_position_encoding(self.pe_max_len, self.d_model))
        queries = jnp.broadcast_to(pe[None, :umax_plus1, :],
                                   (bs, umax_plus1, self.d_model)
                                   ).astype(enc_h.dtype)

        if self.use_conv_dec:
            ac_embed, dec_pos = self.acembed_extractor(
                queries, enc_h, trigger_mask, deterministic=deterministic)
            pred_embed, interce_sad = self.embed_mapper(
                ac_embed, tgt_mask_b1u, dec_pos,
                interce_layer=self._selfce_layer, deterministic=deterministic)
        else:
            ac_embed = self.acembed_extractor(
                queries, enc_h, trigger_mask, deterministic=deterministic)
            dec_pos = None
            pred_embed, interce_sad = self.embed_mapper(
                ac_embed, tgt_mask_b1u, interce_layer=self._selfce_layer,
                deterministic=deterministic)

        if self.use_unimask:
            # shift right with a zero sos embedding + causal self mask
            # (reference: cassnat.py:204-207)
            sos = jnp.zeros_like(pred_embed[:, :1])
            pred_embed = jnp.concatenate([sos, pred_embed[:, :-1]], axis=1)
            causal = jnp.tril(jnp.ones((umax_plus1, umax_plus1), bool))[None]
            tgt_mask = tgt_mask_b1u & causal
        else:
            tgt_mask = tgt_mask_b1u

        src_mask_dec = trigger_mask if self.src_trigger else enc_mask[:, None, :]

        if self.use_conv_dec:
            dec_h, interce_mad = self.decoder(
                pred_embed, enc_h, src_mask_dec, tgt_mask, dec_pos,
                interce_layer=self._mixce_layer, deterministic=deterministic)
        else:
            dec_h, interce_mad = self.decoder(
                pred_embed, enc_h, src_mask_dec, tgt_mask,
                interce_layer=self._mixce_layer, deterministic=deterministic)

        interce_h = interce_sad if self._selfce_layer > 0 else interce_mad
        return dec_h, interce_h, ac_embed, pred_embed

    def __call__(self, src, src_mask, tgt_label, label_sizes,
                 sample_topk: int = 0, label_smooth: Optional[float] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """Training/validation forward.

        src: (B, T, F); src_mask: (B, T) bool; tgt_label: (B, U+1) labels
        (no sos, eos at position label_sizes[b], then padding);
        label_sizes: (B,) counts excl sos/eos.
        (reference: cassnat.py:136-257; label conventions
        cassnat_task.py:259-261)
        """
        enc_h, enc_mask, inter_h = self.encode(src, src_mask, deterministic)
        feat_sizes = enc_mask.sum(-1)
        ctc_out = self.ctc_generator(enc_h)

        umax_plus1 = tgt_label.shape[1]
        ylabels = tgt_label[:, :-1]  # (B, U) labels w/o the eos slot

        if self.use_trigger:
            if self.use_best_path:
                aligned_seq_shift, ylen0 = ctc_best_path_align(
                    jax.lax.stop_gradient(ctc_out), enc_mask,
                    blank=self.padding_idx)
            else:
                rng = (self.make_rng("sample")
                       if sample_topk > 1 else None)
                aligned_seq_shift, _ = ctc_viterbi_align(
                    jax.lax.stop_gradient(ctc_out), ylabels, feat_sizes,
                    label_sizes, blank=self.padding_idx,
                    sample_topk=sample_topk, rng=rng)
                ylen0 = label_sizes
            trigger_mask = align_to_trigger_mask(
                aligned_seq_shift, umax_plus1, enc_mask, feat_sizes, ylen0,
                blank=self.padding_idx)
            trigger_mask = expand_trigger_mask(
                trigger_mask, self.left_trigger, self.right_trigger)
            trigger_mask = trigger_mask & enc_mask[:, None, :]
            ylen = ylen0 + 1  # + eos slot
        else:
            trigger_mask = jnp.broadcast_to(
                enc_mask[:, None, :],
                (enc_mask.shape[0], umax_plus1, enc_mask.shape[1]))
            ylen = label_sizes + 1

        dec_h, interce_h, ac_embed, pred_embed = self.nat_decode_states(
            enc_h, enc_mask, trigger_mask, ylen, umax_plus1, deterministic)
        att_out = self.att_generator(dec_h)

        out = {"ctc_out": ctc_out, "att_out": att_out,
               "feat_sizes": feat_sizes, "ac_embed": ac_embed,
               "pred_embed": pred_embed}
        loss = 0.0
        if self.ctc_alpha > 0:
            ctc_l = ctc_loss(ctc_out, ylabels, feat_sizes, label_sizes,
                             blank=self.padding_idx)
            out["ctc_loss"] = ctc_l
            loss = loss + self.ctc_alpha * ctc_l
        else:
            out["ctc_loss"] = jnp.zeros(())
        if self.interctc_alpha > 0:
            inter_out = self.interctc_generator(inter_h)
            inter_l = ctc_loss(inter_out, ylabels, feat_sizes, label_sizes,
                               blank=self.padding_idx)
            out["interctc_loss"] = inter_l
            loss = loss + self.interctc_alpha * inter_l

        smooth = self.label_smooth if label_smooth is None else label_smooth
        if self.use_best_path:
            # Best-path token count may differ from the labels; mask the loss
            # to predicted slots (reference: loss.py:51-66, cassnat.py:246).
            extra = jnp.arange(umax_plus1)[None, :] < ylen[:, None]
            att_l = label_smoothing_loss(att_out, tgt_label, self.vocab_size,
                                         self.padding_idx, smooth,
                                         extra_mask=extra)
        else:
            att_l = label_smoothing_loss(att_out, tgt_label, self.vocab_size,
                                         self.padding_idx, smooth)
        out["att_loss"] = att_l
        loss = loss + self.att_alpha * att_l

        if self.interce_alpha > 0:
            interce_out = self.interce_generator(interce_h)
            interce_l = label_smoothing_loss(
                interce_out, tgt_label, self.vocab_size, self.padding_idx,
                smooth)
            out["interce_loss"] = interce_l
            loss = loss + self.interce_alpha * interce_l

        out["loss"] = loss
        return out

    def nat_decode(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                   umax_plus1: int, return_logits: bool = False):
        """Decode-time NAT pass from a precomputed alignment.

        Returns (att_out (B,U+1,V), ylen (B,)). Used by ESA/greedy/oracle
        decoding (reference: cassnat.py:420-497). return_logits skips the
        f32 log-softmax (argmax/confidence-only callers).
        """
        feat_sizes = enc_mask.sum(-1)
        trigger_mask = align_to_trigger_mask(
            aligned_seq_shift, umax_plus1, enc_mask, feat_sizes, ylen0,
            blank=self.padding_idx)
        trigger_mask = expand_trigger_mask(
            trigger_mask, self.left_trigger, self.right_trigger)
        trigger_mask = trigger_mask & enc_mask[:, None, :]
        ylen = ylen0 + 1
        dec_h, _, _, _ = self.nat_decode_states(
            enc_h, enc_mask, trigger_mask, ylen, umax_plus1,
            deterministic=True)
        if return_logits:
            return self.att_generator.logits(dec_h), ylen
        return self.att_generator(dec_h), ylen


def make_model(input_size: int, args) -> CassNAT:
    """Factory mirroring the reference surface (reference: cassnat.py:21-89)."""
    return CassNAT(
        input_size=input_size,
        vocab_size=args.vocab_size,
        n_enc=args.N_enc,
        n_extra=getattr(args, "N_extra", 1),
        n_self_dec=getattr(args, "N_self_dec", 5),
        n_mix_dec=getattr(args, "N_mix_dec", 2),
        d_model=args.d_model,
        d_ff=args.d_ff,
        d_encff=getattr(args, "d_encff", 1024),
        d_decff=getattr(args, "d_decff", 1024),
        n_head=args.n_head,
        dropout=args.dropout,
        use_conv_enc=getattr(args, "use_conv_enc", True),
        use_conv_dec=getattr(args, "use_conv_dec", True),
        enc_kernel_size=getattr(args, "enc_kernel_size", 31),
        dec_kernel_size=getattr(args, "dec_kernel_size", 3),
        enc_max_relative_len=getattr(args, "enc_max_relative_len", 20),
        dec_max_relative_len=getattr(args, "dec_max_relative_len", 8),
        pos_type=getattr(args, "pos_type", "relative"),
        share_ff=getattr(args, "share_ff", False),
        use_trigger=getattr(args, "use_trigger", True),
        src_trigger=getattr(args, "src_trigger", True),
        use_unimask=getattr(args, "use_unimask", False),
        left_trigger=getattr(args, "left_trigger", 0),
        right_trigger=getattr(args, "right_trigger", 0),
        use_best_path=getattr(args, "use_best_path", False),
        ctc_alpha=getattr(args, "ctc_alpha", 1.0),
        att_alpha=getattr(args, "att_alpha", 1.0),
        interctc_alpha=getattr(args, "interctc_alpha", 0.0),
        interctc_layer=getattr(args, "interctc_layer", 0),
        interce_alpha=getattr(args, "interce_alpha", 0.0),
        interce_layer=getattr(args, "interce_layer", 0),
        label_smooth=getattr(args, "label_smooth", 0.1),
        padding_idx=getattr(args, "padding_idx", 0),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
        remat=getattr(args, "remat", False),
    )
