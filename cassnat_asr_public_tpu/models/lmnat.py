"""LMNAT family: CASS-NAT enhanced with a pretrained text encoder.

(reference: src/models/lmnat.py, lmnat2.py, lmnat3.py)

  * LMNAT  — the mixed-attention decoder attends to BOTH the audio memory and
    a text memory produced by a text encoder (transformer LM / GPT-2 / BERT)
    run over the CTC greedy hypothesis (reference: lmnat.py:219-248).
  * LMNAT2 — the text memory is injected one stage earlier: the SAD
    (embedding mapper) becomes a mixed-attention stack over the text memory
    (reference: lmnat2.py:50-58, forward §5).
  * LMNAT3 — the SAD is REPLACED by the pretrained text encoder itself via
    pre/post dimension maps; acoustic embeddings are span-masked with a
    learned mask embedding and an auxiliary PLM loss is applied at masked
    positions (reference: lmnat3.py:120-273).

TPU design notes: when the text encoder shares the SP vocabulary
(text_encoder_type='lm'), the reference's detokenize->retokenize hop is an
identity over token ids, so the text input is built ON DEVICE from the CTC
greedy collapse (+ scheduled ground-truth mixing) and the whole forward is
one jitted function. For GPT-2/BERT vocabularies the task layer performs the
host-side re-tokenization and passes `text_input` in.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cassnat_asr_public_tpu.models.cassnat import CassNAT
from cassnat_asr_public_tpu.nn.blocks import (
    Mix3AttDecoder,
    TrfAcExtra,
    TrfDecoderLayer,
    TrfMAD,
    TrfSAD,
)
from cassnat_asr_public_tpu.nn.modules import Generator, \
    sinusoidal_position_encoding
from cassnat_asr_public_tpu.nn.text_encoders import BertBackbone, GPT2Backbone
from cassnat_asr_public_tpu.models.lm import TransformerLM
from cassnat_asr_public_tpu.ops.ctc import (
    align_to_trigger_mask,
    ctc_best_path_align,
    ctc_greedy_collapse,
    ctc_loss,
    ctc_viterbi_align,
    expand_trigger_mask,
)
from cassnat_asr_public_tpu.ops.ssl import compute_span_mask, num_mask_spans
from cassnat_asr_public_tpu.utils.losses import label_smoothing_loss


class _LMNATBase(CassNAT):
    """Shared machinery: encoder + alignment + text-encoder invocation."""
    text_encoder_type: str = "lm"   # "lm" | "gpt2" | "bert"
    text_vocab_size: int = 0        # 0 -> same as vocab_size
    text_n_layers: int = 12
    d_text: int = 512
    freeze_text_encoder: bool = True
    mix_type: str = "none"          # "none" | "utterance" | "token"
    mix_gt_prob: float = 0.5
    text_encoder_sample_greedy: bool = False
    audio_first: bool = True    # cross-attention order in Mix3 (lmnat.py:52,58)
    # decode: text input per ESA candidate (True) or once per utterance from
    # its first candidate, tiled (False) (reference: lmnat2.py:485-516)
    use_esa_for_text_encoder: bool = True

    def _make_text_encoder(self):
        tv = self.text_vocab_size or self.vocab_size
        if self.text_encoder_type == "lm":
            return TransformerLM(tv, self.text_n_layers, self.d_text,
                                 self.d_text * 4, self.n_head, self.dropout,
                                 compute_dtype=self.compute_dtype,
                                 name="text_encoder")
        if self.text_encoder_type == "gpt2":
            return GPT2Backbone(tv, self.text_n_layers, self.d_text,
                                self.n_head,
                                compute_dtype=self.compute_dtype,
                                name="text_encoder")
        if self.text_encoder_type == "bert":
            return BertBackbone(tv, self.text_n_layers, self.d_text,
                                self.n_head, self.d_text * 4,
                                compute_dtype=self.compute_dtype,
                                name="text_encoder")
        raise ValueError(self.text_encoder_type)

    def _text_features(self, text_input, text_mask, deterministic):
        if self.text_encoder_type == "lm":
            feats = self.text_encoder.extract_features(
                text_input, deterministic=deterministic)
        elif self.text_encoder_type == "gpt2":
            feats = self.text_encoder.extract_features(
                text_input, deterministic=deterministic)
        else:
            feats = self.text_encoder.extract_features(
                text_input, attention_mask=text_mask,
                deterministic=deterministic)
        if self.freeze_text_encoder:
            feats = jax.lax.stop_gradient(feats)
        return self.dim_map(feats)

    def _device_text_input(self, ctc_out, enc_mask, tgt_label,
                           aligned_seq_shift, deterministic,
                           mix_gt_prob=None):
        """CTC greedy hypothesis as text-encoder input (+ GT mixing, + sos).

        (reference: lmnat.py:214-236 + mix_text_encoder_input:280-290)
        Only valid when the text encoder shares the ASR vocabulary.
        """
        hyp, _ = ctc_greedy_collapse(jax.lax.stop_gradient(ctc_out),
                                     enc_mask, blank=self.padding_idx)
        lmax = tgt_label.shape[1]
        hyp = hyp[:, :lmax] if hyp.shape[1] >= lmax else jnp.pad(
            hyp, ((0, 0), (0, lmax - hyp.shape[1])))
        if self.mix_type != "none" and not deterministic:
            rng = self.make_rng("mix")
            bs, sl = hyp.shape
            if self.mix_type == "utterance":
                r = jax.random.uniform(rng, (bs, 1))
            else:
                r = jax.random.uniform(rng, (bs, sl))
            prob = self.mix_gt_prob if mix_gt_prob is None else mix_gt_prob
            use_gt = r < prob
            hyp = jnp.where(use_gt, tgt_label[:, :sl], hyp)
        sos = jnp.ones((hyp.shape[0], 1), hyp.dtype)
        text_input = jnp.concatenate([sos, hyp[:, :-1]], axis=1)
        return text_input, text_input != self.padding_idx

    def _encode_and_align(self, src, src_mask, tgt_label, label_sizes,
                          sample_topk, deterministic):
        enc_h, enc_mask, inter_h = self.encode(src, src_mask, deterministic)
        feat_sizes = enc_mask.sum(-1)
        ctc_out = self.ctc_generator(enc_h)
        umax_plus1 = tgt_label.shape[1]
        ylabels = tgt_label[:, :-1]
        rng = self.make_rng("sample") if sample_topk > 1 else None
        shift, _ = ctc_viterbi_align(
            jax.lax.stop_gradient(ctc_out), ylabels, feat_sizes, label_sizes,
            blank=self.padding_idx, sample_topk=sample_topk, rng=rng)
        trig = align_to_trigger_mask(shift, umax_plus1, enc_mask, feat_sizes,
                                     label_sizes, blank=self.padding_idx)
        trig = expand_trigger_mask(trig, self.left_trigger,
                                   self.right_trigger) & enc_mask[:, None, :]
        return (enc_h, enc_mask, inter_h, ctc_out, shift, trig,
                label_sizes + 1, umax_plus1, feat_sizes, ylabels)

    def _queries(self, bs, umax_plus1, dtype):
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.pe_max_len, self.d_model))
        return jnp.broadcast_to(pe[None, :umax_plus1, :],
                                (bs, umax_plus1, self.d_model)).astype(dtype)

    def _device_text_from_alignment(self, aligned_seq_shift, umax_plus1):
        """Decode-time text input from an alignment, on device.

        The reference takes the nonzero tokens of aligned_seq_shift per
        candidate, detokenizes, and re-tokenizes with the text-encoder
        tokenizer (reference: lmnat.py:493-516). With the shared-vocab 'lm'
        text encoder that hop is an identity over ids, so it reduces to a
        left-justified compaction of the nonzero alignment entries plus a
        sos prefix — fully jittable.
        """
        tok = aligned_seq_shift
        t = tok.shape[1]
        key = jnp.where(tok != self.padding_idx, jnp.arange(t)[None, :],
                        t + jnp.arange(t)[None, :])
        order = jnp.argsort(key, axis=1)
        compact = jnp.take_along_axis(
            jnp.where(tok != self.padding_idx, tok, 0), order, axis=1)
        compact = compact[:, :umax_plus1 - 1] if t >= umax_plus1 - 1 else \
            jnp.pad(compact, ((0, 0), (0, umax_plus1 - 1 - t)))
        sos = jnp.ones((tok.shape[0], 1), tok.dtype)
        text_input = jnp.concatenate([sos, compact], axis=1)
        return text_input, text_input != self.padding_idx

    def _decode_common(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                       umax_plus1):
        """Shared decode-time prep: trigger mask, queries, AcExtra + SAD
        inputs (mirrors CassNAT.nat_decode; reference lmnat.py:415-497)."""
        feat_sizes = enc_mask.sum(-1)
        trig = align_to_trigger_mask(aligned_seq_shift, umax_plus1, enc_mask,
                                     feat_sizes, ylen0,
                                     blank=self.padding_idx)
        trig = expand_trigger_mask(trig, self.left_trigger,
                                   self.right_trigger) & enc_mask[:, None, :]
        ylen = ylen0 + 1
        tgt_mask_b1u = (jnp.arange(umax_plus1)[None, :]
                        < ylen[:, None])[:, None, :]
        queries = self._queries(enc_h.shape[0], umax_plus1, enc_h.dtype)
        return trig, ylen, tgt_mask_b1u, queries

    def _losses(self, ctc_out, att_out, ylabels, tgt_label, label_sizes,
                feat_sizes, label_smooth=None):
        out = {}
        loss = 0.0
        smooth = self.label_smooth if label_smooth is None else label_smooth
        ctc_l = ctc_loss(ctc_out, ylabels, feat_sizes, label_sizes,
                         blank=self.padding_idx)
        out["ctc_loss"] = ctc_l
        loss = loss + self.ctc_alpha * ctc_l
        att_l = label_smoothing_loss(att_out, tgt_label, self.vocab_size,
                                     self.padding_idx, smooth)
        out["att_loss"] = att_l
        loss = loss + self.att_alpha * att_l
        out["loss"] = loss
        return out


class LMNAT(_LMNATBase):
    """Text memory fused in the mixed-attention decoder (Mix3AttDecoder)."""

    def setup(self):
        super().setup()
        self.text_encoder = self._make_text_encoder()
        self.dim_map = nn.Dense(self.d_model, name="dim_map")
        self.mad3 = Mix3AttDecoder(
            self.d_model, self.n_head, self.d_decff, self.n_mix_dec,
            self.dropout, compute_dtype=self.compute_dtype,
            audio_first=self.audio_first, name="mad3")

    def __call__(self, src, src_mask, tgt_label, label_sizes,
                 sample_topk: int = 0, text_input=None, text_mask=None,
                 mix_gt_prob=None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        (enc_h, enc_mask, _, ctc_out, shift, trig, ylen, umax_plus1,
         feat_sizes, ylabels) = self._encode_and_align(
            src, src_mask, tgt_label, label_sizes, sample_topk, deterministic)

        tgt_mask_b1u = (jnp.arange(umax_plus1)[None, :]
                        < ylen[:, None])[:, None, :]
        queries = self._queries(enc_h.shape[0], umax_plus1, enc_h.dtype)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig,
                                                 deterministic=deterministic)
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u, dec_pos,
                                        deterministic=deterministic)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig,
                                        deterministic=deterministic)
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u,
                                        deterministic=deterministic)

        if text_input is None:
            text_input, text_mask = self._device_text_input(
                ctc_out, enc_mask, tgt_label, shift, deterministic,
                mix_gt_prob=mix_gt_prob)
        text_embed = self._text_features(text_input, text_mask,
                                         deterministic)

        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        dec_h, _ = self.mad3(pred, enc_h, text_embed, src_mask_dec,
                             text_mask[:, None, :], tgt_mask_b1u,
                             deterministic=deterministic)
        att_out = self.att_generator(dec_h)
        out = self._losses(ctc_out, att_out, ylabels, tgt_label, label_sizes,
                           feat_sizes)
        out.update(ctc_out=ctc_out, att_out=att_out, feat_sizes=feat_sizes)
        return out

    def nat_decode(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                   umax_plus1: int, text_input=None, text_mask=None,
                   text_stride: int = 1, return_logits: bool = False):
        """Text-fused NAT decode from a precomputed alignment.

        (reference: lmnat.py:415-637 beam_decode — CTC alignment -> text
        features -> Mix3 fused decoder pass.) text_input=None builds the
        text on device from the alignment (valid for the shared-vocab 'lm'
        text encoder); GPT-2/BERT callers pass host-retokenized ids.
        """
        trig, ylen, tgt_mask_b1u, queries = self._decode_common(
            enc_h, enc_mask, aligned_seq_shift, ylen0, umax_plus1)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig)
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u, dec_pos)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig)
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u)
        if text_input is None:
            if text_stride > 1 and not self.use_esa_for_text_encoder:
                ti0, tm0 = self._device_text_from_alignment(
                    aligned_seq_shift[::text_stride], umax_plus1)
                text_input = jnp.repeat(ti0, text_stride, axis=0)
                text_mask = jnp.repeat(tm0, text_stride, axis=0)
            else:
                text_input, text_mask = self._device_text_from_alignment(
                    aligned_seq_shift, umax_plus1)
        text_embed = self._text_features(text_input, text_mask, True)
        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        dec_h, _ = self.mad3(pred, enc_h, text_embed, src_mask_dec,
                             text_mask[:, None, :], tgt_mask_b1u)
        if return_logits:
            return self.att_generator.logits(dec_h), ylen
        return self.att_generator(dec_h), ylen


class LMNAT2(_LMNATBase):
    """Text memory fused into the SAD stage (embedding mapper attends to
    text; reference: lmnat2.py forward §5)."""

    def setup(self):
        super().setup()
        self.text_encoder = self._make_text_encoder()
        self.dim_map = nn.Dense(self.d_model, name="dim_map")
        # SAD becomes a mixed-attention stack over the text memory
        self.sad_mix = TrfMAD(self.d_model, self.n_head, self.d_decff,
                              self.n_self_dec, self.dropout,
                              compute_dtype=self.compute_dtype,
                              name="sad_mix")

    def __call__(self, src, src_mask, tgt_label, label_sizes,
                 sample_topk: int = 0, text_input=None, text_mask=None,
                 mix_gt_prob=None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        (enc_h, enc_mask, _, ctc_out, shift, trig, ylen, umax_plus1,
         feat_sizes, ylabels) = self._encode_and_align(
            src, src_mask, tgt_label, label_sizes, sample_topk, deterministic)

        tgt_mask_b1u = (jnp.arange(umax_plus1)[None, :]
                        < ylen[:, None])[:, None, :]
        queries = self._queries(enc_h.shape[0], umax_plus1, enc_h.dtype)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig,
                                                 deterministic=deterministic)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig,
                                        deterministic=deterministic)
            dec_pos = None

        if text_input is None:
            text_input, text_mask = self._device_text_input(
                ctc_out, enc_mask, tgt_label, shift, deterministic,
                mix_gt_prob=mix_gt_prob)
        text_embed = self._text_features(text_input, text_mask,
                                         deterministic)

        pred, _ = self.sad_mix(ac, text_embed, text_mask[:, None, :],
                               tgt_mask_b1u, deterministic=deterministic)

        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        if self.use_conv_dec:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    dec_pos, deterministic=deterministic)
        else:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    deterministic=deterministic)
        att_out = self.att_generator(dec_h)
        out = self._losses(ctc_out, att_out, ylabels, tgt_label, label_sizes,
                           feat_sizes)
        out.update(ctc_out=ctc_out, att_out=att_out, feat_sizes=feat_sizes)
        return out

    def nat_decode(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                   umax_plus1: int, text_input=None, text_mask=None,
                   text_stride: int = 1, return_logits: bool = False):
        """Decode with text fused at the SAD stage (reference: lmnat2.py
        beam_decode — SAD is a mixed-attention stack over the text memory)."""
        trig, ylen, tgt_mask_b1u, queries = self._decode_common(
            enc_h, enc_mask, aligned_seq_shift, ylen0, umax_plus1)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig)
            dec_pos = None
        if text_input is None:
            if text_stride > 1 and not self.use_esa_for_text_encoder:
                ti0, tm0 = self._device_text_from_alignment(
                    aligned_seq_shift[::text_stride], umax_plus1)
                text_input = jnp.repeat(ti0, text_stride, axis=0)
                text_mask = jnp.repeat(tm0, text_stride, axis=0)
            else:
                text_input, text_mask = self._device_text_from_alignment(
                    aligned_seq_shift, umax_plus1)
        text_embed = self._text_features(text_input, text_mask, True)
        pred, _ = self.sad_mix(ac, text_embed, text_mask[:, None, :],
                               tgt_mask_b1u)
        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        if self.use_conv_dec:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    dec_pos)
        else:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u)
        if return_logits:
            return self.att_generator.logits(dec_h), ylen
        return self.att_generator(dec_h), ylen


class LMNAT3(_LMNATBase):
    """SAD replaced by the pretrained text encoder over (masked) acoustic
    embeddings; auxiliary PLM loss on masked positions
    (reference: lmnat3.py:120-273)."""
    plm_alpha: float = 0.3
    acoustic_mask_prob: float = 0.3
    acoustic_mask_length: int = 3

    def setup(self):
        super().setup()
        self.text_encoder = self._make_text_encoder()
        self.pre_map = nn.Dense(self.d_text, name="pre_map")
        self.post_map = nn.Dense(self.d_model, name="post_map")
        self.acoustic_mask_embed = self.param(
            "acoustic_mask_embed", nn.initializers.uniform(scale=1.0),
            (self.d_model,))
        if self.plm_alpha > 0:
            self.plm_generator = Generator(self.vocab_size, add_norm=True,
                                           compute_dtype=self.compute_dtype,
                                           name="plm_generator")

    def _text_backbone_on_embeds(self, embeds, deterministic):
        """Run the text encoder's transformer over acoustic embeddings."""
        h = self.pre_map(embeds)
        if self.text_encoder_type == "lm":
            x = self.text_encoder.pos(h, deterministic=deterministic)
            t = x.shape[1]
            mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
            for layer in self.text_encoder.layers:
                x = layer(x, mask, deterministic)
            feats = self.text_encoder.norm(x)
        else:
            # GPT-2/BERT paths run their blocks over projected embeddings
            feats = self.text_encoder.extract_features_embeds(
                h, deterministic=deterministic) \
                if hasattr(self.text_encoder, "extract_features_embeds") \
                else h
        if self.freeze_text_encoder:
            feats = jax.lax.stop_gradient(feats)
        return self.post_map(feats)

    def __call__(self, src, src_mask, tgt_label, label_sizes,
                 sample_topk: int = 0, deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        (enc_h, enc_mask, _, ctc_out, shift, trig, ylen, umax_plus1,
         feat_sizes, ylabels) = self._encode_and_align(
            src, src_mask, tgt_label, label_sizes, sample_topk, deterministic)

        tgt_mask_b1u = (jnp.arange(umax_plus1)[None, :]
                        < ylen[:, None])[:, None, :]
        queries = self._queries(enc_h.shape[0], umax_plus1, enc_h.dtype)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig,
                                                 deterministic=deterministic)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig,
                                        deterministic=deterministic)
            dec_pos = None

        # span-mask acoustic embeddings (reference: lmnat3.py:202-215)
        span_mask = None
        if not deterministic and self.acoustic_mask_prob > 0:
            n_spans = num_mask_spans(umax_plus1, self.acoustic_mask_prob,
                                     self.acoustic_mask_length, min_masks=1)
            span_mask = compute_span_mask(
                self.make_rng("mask"), ylen, umax_plus1, n_spans,
                self.acoustic_mask_length)
            ac = jnp.where(span_mask[..., None],
                           self.acoustic_mask_embed.astype(ac.dtype), ac)

        pred = self._text_backbone_on_embeds(ac, deterministic)

        out_extra = {}
        loss_plm = 0.0
        if span_mask is not None and self.plm_alpha > 0:
            plm_out = self.plm_generator(pred)
            masked_targets = jnp.where(span_mask, tgt_label, self.padding_idx)
            loss_plm = label_smoothing_loss(
                plm_out, masked_targets, self.vocab_size, self.padding_idx,
                self.label_smooth)
            out_extra["plm_loss"] = loss_plm

        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        if self.use_conv_dec:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    dec_pos, deterministic=deterministic)
        else:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    deterministic=deterministic)
        att_out = self.att_generator(dec_h)
        out = self._losses(ctc_out, att_out, ylabels, tgt_label, label_sizes,
                           feat_sizes)
        out["loss"] = out["loss"] + self.plm_alpha * loss_plm
        out.update(out_extra, ctc_out=ctc_out, att_out=att_out,
                   feat_sizes=feat_sizes)
        return out

    def nat_decode(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                   umax_plus1: int, text_input=None, text_mask=None,
                   text_stride: int = 1, return_logits: bool = False):
        """Decode with the text-encoder backbone as SAD, no span masking
        (reference: lmnat3.py beam_decode)."""
        del text_input, text_mask  # LMNAT3's SAD consumes embeddings, not text
        trig, ylen, tgt_mask_b1u, queries = self._decode_common(
            enc_h, enc_mask, aligned_seq_shift, ylen0, umax_plus1)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trig)
        else:
            ac = self.acembed_extractor(queries, enc_h, trig)
            dec_pos = None
        pred = self._text_backbone_on_embeds(ac, True)
        src_mask_dec = trig if self.src_trigger else enc_mask[:, None, :]
        if self.use_conv_dec:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    dec_pos)
        else:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u)
        if return_logits:
            return self.att_generator.logits(dec_h), ylen
        return self.att_generator(dec_h), ylen


def _common_kwargs(input_size, args):
    return dict(
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
        use_conv_dec=getattr(args, "use_conv_dec", False),
        enc_kernel_size=getattr(args, "enc_kernel_size", 31),
        dec_kernel_size=getattr(args, "dec_kernel_size", 3),
        enc_max_relative_len=getattr(args, "enc_max_relative_len", 20),
        dec_max_relative_len=getattr(args, "dec_max_relative_len", 8),
        pos_type=getattr(args, "pos_type", "relative"),
        share_ff=getattr(args, "share_ff", False),
        use_trigger=getattr(args, "use_trigger", True),
        src_trigger=getattr(args, "src_trigger", True),
        use_unimask=getattr(args, "use_unimask", False),
        ctc_alpha=getattr(args, "ctc_alpha", 1.0),
        att_alpha=getattr(args, "att_alpha", 1.0),
        label_smooth=getattr(args, "label_smooth", 0.1),
        padding_idx=getattr(args, "padding_idx", 0),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
        text_encoder_type=getattr(args, "text_encoder_type", "lm"),
        text_vocab_size=getattr(args, "text_vocab_size", 0),
        text_n_layers=getattr(args, "text_encoder_layers", 12),
        d_text=getattr(args, "d_text", args.d_model),
        freeze_text_encoder=getattr(args, "freeze_text_encoder", True),
        mix_type=getattr(args, "mix_type", "none"),
        mix_gt_prob=getattr(args, "mix_gt_prob", 0.5),
        audio_first=getattr(args, "audio_first", True),
        use_esa_for_text_encoder=getattr(args, "use_esa_for_text_encoder",
                                         True),
    )


def make_lmnat(input_size: int, args) -> LMNAT:
    return LMNAT(**_common_kwargs(input_size, args))


def make_lmnat2(input_size: int, args) -> LMNAT2:
    return LMNAT2(**_common_kwargs(input_size, args))


def make_lmnat3(input_size: int, args) -> LMNAT3:
    kw = _common_kwargs(input_size, args)
    # LMNAT3 spells the text-encoder flavor/freeze keys sad_type/freeze_sad
    # (reference: lmnat3.py:67-83, lmnat3_task.py:57-74)
    if getattr(args, "sad_type", None):
        kw["text_encoder_type"] = args.sad_type
    if getattr(args, "freeze_sad", None) is not None:
        kw["freeze_text_encoder"] = args.freeze_sad
    kw.update(plm_alpha=getattr(args, "plm_alpha", 0.3),
              acoustic_mask_prob=getattr(args, "acoustic_mask_prob", 0.3),
              acoustic_mask_length=getattr(args, "acoustic_mask_length", 3))
    return LMNAT3(**kw)
