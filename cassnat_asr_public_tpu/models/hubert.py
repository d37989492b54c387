"""HubertModel (raw-waveform encoder) + HubertNAT (CASS-NAT decoder on top).

(reference: src/models/hubert/hubert_blocks.py HubertModel:313-640 and
src/models/hubert/hubert_model.py HubertNAT — the CASS-NAT trigger-mask
decoder mounted on a HuBERT encoder; fairseq checkpoint import with key
remapping reference: src/tasks/hubert_task.py:75-117.)

The fairseq `hubert_base_ls960.pt` import is implemented as an explicit
torch->flax key map (load_fairseq_hubert); torch (CPU) is only used to
deserialize the checkpoint.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cassnat_asr_public_tpu.nn.blocks import (
    ConAcExtra,
    ConMAD,
    ConSAD,
    TrfAcExtra,
    TrfMAD,
    TrfSAD,
)
from cassnat_asr_public_tpu.nn.hubert_frontend import (
    DEFAULT_CONV_LAYERS,
    ConvFeatureExtractor,
    HubertTransformerEncoder,
    parse_conv_layers,
)
from cassnat_asr_public_tpu.nn.modules import Generator, \
    sinusoidal_position_encoding
from cassnat_asr_public_tpu.ops.ctc import (
    align_to_trigger_mask,
    ctc_best_path_align,
    ctc_loss,
    ctc_viterbi_align,
    expand_trigger_mask,
)
from cassnat_asr_public_tpu.ops.ssl import compute_span_mask, num_mask_spans
from cassnat_asr_public_tpu.utils.losses import label_smoothing_loss


def _grad_multiply(x, g: float):
    """Identity forward, gradient scaled by g (reference GradMultiply,
    hubert_blocks.py forward_features feature_grad_mult)."""
    return x * g + jax.lax.stop_gradient(x * (1.0 - g))


class HubertEncoderModel(nn.Module):
    """Waveform -> contextual features (the pretrained part)."""
    d_model: int = 768
    n_layers: int = 12
    n_head: int = 12
    d_ff: int = 3072
    dropout: float = 0.1
    layerdrop: float = 0.05
    mask_prob: float = 0.0
    mask_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    dropout_input: float = 0.0
    feature_grad_mult: float = 1.0
    conv_layers: tuple = DEFAULT_CONV_LAYERS
    conv_pos: int = 128
    conv_pos_groups: int = 16
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.feature_extractor = ConvFeatureExtractor(
            conv_layers=self.conv_layers,
            compute_dtype=self.compute_dtype, name="feature_extractor")
        self.feat_ln = nn.LayerNorm(name="feat_ln")
        self.post_extract_proj = nn.Dense(self.d_model,
                                          name="post_extract_proj")
        self.encoder = HubertTransformerEncoder(
            self.n_layers, self.d_model, self.n_head, self.d_ff,
            self.dropout, self.layerdrop, conv_pos=self.conv_pos,
            conv_pos_groups=self.conv_pos_groups,
            compute_dtype=self.compute_dtype,
            name="encoder")
        self.mask_embed = self.param("mask_embed",
                                     nn.initializers.uniform(scale=1.0),
                                     (self.d_model,))
        self.drop_in = nn.Dropout(self.dropout_input, name="dropout_input")

    def __call__(self, wav, wav_lengths, mask: bool = False,
                 deterministic: bool = True):
        """wav: (B, S); wav_lengths: (B,). Returns (x (B,T,D), feat_mask)."""
        feats = self.feature_extractor(wav)  # (B, T, C)
        if self.feature_grad_mult == 0.0:
            feats = jax.lax.stop_gradient(feats)
        elif self.feature_grad_mult != 1.0:
            # reference scales the conv-frontend gradient during fine-tuning
            # (hubert_train.yaml feature_grad_mult 0.1)
            feats = _grad_multiply(feats, self.feature_grad_mult)
        tmax = feats.shape[1]
        out_lens = self._out_lengths(wav_lengths)
        feat_mask = jnp.arange(tmax)[None, :] < out_lens[:, None]
        feats = self.feat_ln(feats)
        x = self.post_extract_proj(feats)
        if self.dropout_input > 0:
            x = self.drop_in(x, deterministic=deterministic)
        if mask and self.mask_prob > 0:
            n_spans = num_mask_spans(tmax, self.mask_prob, self.mask_length)
            span = compute_span_mask(self.make_rng("mask"), out_lens, tmax,
                                     n_spans, self.mask_length)
            x = jnp.where(span[..., None], self.mask_embed.astype(x.dtype), x)
        if mask and self.mask_channel_prob > 0:
            # channel spans zeroed across all frames
            # (reference apply_mask, hubert_blocks.py:427-444)
            c = x.shape[-1]
            n_spans = num_mask_spans(c, self.mask_channel_prob,
                                     self.mask_channel_length)
            cspan = compute_span_mask(
                self.make_rng("mask"),
                jnp.full((x.shape[0],), c, jnp.int32), c, n_spans,
                self.mask_channel_length)
            x = jnp.where(cspan[:, None, :], 0.0, x)
        x = self.encoder(x, feat_mask, deterministic=deterministic)
        return x, feat_mask

    def _out_lengths(self, wav_lengths):
        n = wav_lengths
        for _, k, s in self.conv_layers:
            n = (n - k) // s + 1
        return jnp.maximum(n, 1)


class HubertNAT(nn.Module):
    """HuBERT encoder + CASS-NAT decoder (reference: hubert_model.py:37-135)."""
    vocab_size: int
    d_model: int = 768
    n_layers: int = 12
    n_head: int = 12
    d_ff: int = 3072
    encoder_dropout: float = 0.1
    layerdrop: float = 0.05
    # fine-tune span-mask augmentation + frontend grad scaling
    # (reference: hubert_train.yaml mask_prob 0.8, feature_grad_mult 0.1;
    # applied in hubert_blocks.py forward via apply_mask)
    mask_prob: float = 0.0
    mask_length: int = 10
    mask_channel_prob: float = 0.0
    mask_channel_length: int = 10
    dropout_input: float = 0.0
    feature_grad_mult: float = 1.0
    conv_layers: tuple = DEFAULT_CONV_LAYERS
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # NAT decoder config
    use_conv_dec: bool = True
    n_extra: int = 1
    n_self_dec: int = 5
    n_mix_dec: int = 2
    d_decff: int = 1024
    dec_n_head: int = 8
    dec_kernel_size: int = 3
    dec_max_relative_len: int = 8
    dropout: float = 0.1
    use_trigger: bool = True
    src_trigger: bool = True
    use_unimask: bool = False
    left_trigger: int = 0
    right_trigger: int = 0
    use_best_path: bool = False
    ctc_alpha: float = 1.0
    att_alpha: float = 1.0
    interctc_alpha: float = 0.0
    interce_alpha: float = 0.0
    interce_layer: int = 0
    label_smooth: float = 0.1
    padding_idx: int = 0
    freeze_encoder: bool = False
    compute_dtype: Any = jnp.float32
    pe_max_len: int = 5000

    def setup(self):
        self.hub_base = HubertEncoderModel(
            self.d_model, self.n_layers, self.n_head, self.d_ff,
            self.encoder_dropout, self.layerdrop,
            mask_prob=self.mask_prob, mask_length=self.mask_length,
            mask_channel_prob=self.mask_channel_prob,
            mask_channel_length=self.mask_channel_length,
            dropout_input=self.dropout_input,
            feature_grad_mult=self.feature_grad_mult,
            conv_layers=self.conv_layers, conv_pos=self.conv_pos,
            conv_pos_groups=self.conv_pos_groups,
            compute_dtype=self.compute_dtype, name="hub_base")
        if self.use_conv_dec:
            self.acembed_extractor = ConAcExtra(
                self.d_model, self.dec_n_head, self.d_ff, self.dropout,
                max_relative_len=self.dec_max_relative_len,
                compute_dtype=self.compute_dtype, name="acembed_extractor")
            self.embed_mapper = ConSAD(
                self.d_model, self.dec_n_head, self.d_decff,
                self.dec_kernel_size, self.n_self_dec, self.dropout,
                pos_type="relative",
                max_relative_len=self.dec_max_relative_len,
                compute_dtype=self.compute_dtype, name="embed_mapper")
            self.decoder = ConMAD(
                self.d_model, self.dec_n_head, self.d_decff,
                self.dec_kernel_size, self.n_mix_dec, self.dropout,
                compute_dtype=self.compute_dtype, name="decoder")
        else:
            self.acembed_extractor = TrfAcExtra(
                self.d_model, self.dec_n_head, self.d_decff, self.n_extra,
                self.dropout, compute_dtype=self.compute_dtype,
                name="acembed_extractor")
            self.embed_mapper = TrfSAD(
                self.d_model, self.dec_n_head, self.d_decff, self.n_self_dec,
                self.dropout, compute_dtype=self.compute_dtype,
                name="embed_mapper")
            self.decoder = TrfMAD(
                self.d_model, self.dec_n_head, self.d_decff, self.n_mix_dec,
                self.dropout, compute_dtype=self.compute_dtype,
                name="decoder")
        self.ctc_generator = Generator(self.vocab_size,
                                       compute_dtype=self.compute_dtype,
                                       name="ctc_generator")
        self.att_generator = Generator(self.vocab_size,
                                       compute_dtype=self.compute_dtype,
                                       name="att_generator")

    def encode_ctc(self, wav, wav_lengths):
        enc_h, feat_mask = self.hub_base(wav, wav_lengths,
                                         deterministic=True)
        return enc_h, feat_mask, self.ctc_generator(enc_h)

    def _nat_states(self, enc_h, enc_mask, trigger_mask, ylen, umax_plus1,
                    deterministic):
        bs = enc_h.shape[0]
        tgt_mask_b1u = (jnp.arange(umax_plus1)[None, :]
                        < ylen[:, None])[:, None, :]
        pe = jnp.asarray(
            sinusoidal_position_encoding(self.pe_max_len, self.d_model))
        queries = jnp.broadcast_to(pe[None, :umax_plus1, :],
                                   (bs, umax_plus1, self.d_model)
                                   ).astype(enc_h.dtype)
        if self.use_conv_dec:
            ac, dec_pos = self.acembed_extractor(queries, enc_h, trigger_mask,
                                                 deterministic=deterministic)
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u, dec_pos,
                                        deterministic=deterministic)
        else:
            ac = self.acembed_extractor(queries, enc_h, trigger_mask,
                                        deterministic=deterministic)
            dec_pos = None
            pred, _ = self.embed_mapper(ac, tgt_mask_b1u,
                                        deterministic=deterministic)
        src_mask_dec = trigger_mask if self.src_trigger \
            else enc_mask[:, None, :]
        if self.use_conv_dec:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    dec_pos, deterministic=deterministic)
        else:
            dec_h, _ = self.decoder(pred, enc_h, src_mask_dec, tgt_mask_b1u,
                                    deterministic=deterministic)
        return dec_h

    def __call__(self, wav, wav_lengths, tgt_label, label_sizes,
                 sample_topk: int = 0, deterministic: bool = True
                 ) -> Dict[str, jnp.ndarray]:
        # training applies the fine-tune span-mask augmentation (reference
        # hubert_model.py:160 -> hubert_blocks.py apply_mask with the yaml
        # mask_prob); eval/decode runs unmasked (the reference's unmasked
        # entry is extract_features, hubert_blocks.py:595-612)
        enc_h, enc_mask = self.hub_base(wav, wav_lengths,
                                        mask=not deterministic,
                                        deterministic=deterministic)
        if self.freeze_encoder:
            enc_h = jax.lax.stop_gradient(enc_h)
        feat_sizes = enc_mask.sum(-1)
        ctc_out = self.ctc_generator(enc_h)
        umax_plus1 = tgt_label.shape[1]
        ylabels = tgt_label[:, :-1]

        if self.use_best_path:
            shift, ylen0 = ctc_best_path_align(
                jax.lax.stop_gradient(ctc_out), enc_mask,
                blank=self.padding_idx)
        else:
            rng = self.make_rng("sample") if sample_topk > 1 else None
            shift, _ = ctc_viterbi_align(
                jax.lax.stop_gradient(ctc_out), ylabels, feat_sizes,
                label_sizes, blank=self.padding_idx,
                sample_topk=sample_topk, rng=rng)
            ylen0 = label_sizes
        trig = align_to_trigger_mask(shift, umax_plus1, enc_mask, feat_sizes,
                                     ylen0, blank=self.padding_idx)
        trig = expand_trigger_mask(trig, self.left_trigger,
                                   self.right_trigger) & enc_mask[:, None, :]
        dec_h = self._nat_states(enc_h, enc_mask, trig, ylen0 + 1,
                                 umax_plus1, deterministic)
        att_out = self.att_generator(dec_h)

        ctc_l = ctc_loss(ctc_out, ylabels, feat_sizes, label_sizes,
                         blank=self.padding_idx)
        att_l = label_smoothing_loss(att_out, tgt_label, self.vocab_size,
                                     self.padding_idx, self.label_smooth)
        loss = self.ctc_alpha * ctc_l + self.att_alpha * att_l
        return {"loss": loss, "ctc_loss": ctc_l, "att_loss": att_l,
                "ctc_out": ctc_out, "att_out": att_out,
                "feat_sizes": feat_sizes}

    def nat_decode(self, enc_h, enc_mask, aligned_seq_shift, ylen0,
                   umax_plus1: int, return_logits: bool = False):
        feat_sizes = enc_mask.sum(-1)
        trig = align_to_trigger_mask(aligned_seq_shift, umax_plus1, enc_mask,
                                     feat_sizes, ylen0,
                                     blank=self.padding_idx)
        trig = expand_trigger_mask(trig, self.left_trigger,
                                   self.right_trigger) & enc_mask[:, None, :]
        dec_h = self._nat_states(enc_h, enc_mask, trig, ylen0 + 1,
                                 umax_plus1, True)
        if return_logits:
            return self.att_generator.logits(dec_h), ylen0 + 1
        return self.att_generator(dec_h), ylen0 + 1


def make_model(args) -> HubertNAT:
    """(reference: src/models/hubert/hubert_model.py:37-109)"""
    return HubertNAT(
        vocab_size=args.vocab_size,
        d_model=getattr(args, "encoder_embed_dim", 768),
        n_layers=getattr(args, "encoder_layers", 12),
        n_head=getattr(args, "encoder_attention_heads", 12),
        d_ff=getattr(args, "encoder_ffn_embed_dim", 3072),
        encoder_dropout=getattr(args, "encoder_dropout", 0.1),
        layerdrop=getattr(args, "encoder_layerdrop", 0.05),
        mask_prob=getattr(args, "mask_prob", 0.0),
        mask_length=getattr(args, "mask_length", 10),
        mask_channel_prob=getattr(args, "mask_channel_prob", 0.0),
        mask_channel_length=getattr(args, "mask_channel_length", 10),
        dropout_input=getattr(args, "dropout_input", 0.0),
        feature_grad_mult=getattr(args, "feature_grad_mult", 1.0),
        conv_layers=parse_conv_layers(
            getattr(args, "conv_feature_layers", DEFAULT_CONV_LAYERS)),
        conv_pos=getattr(args, "conv_pos", 128),
        conv_pos_groups=getattr(args, "conv_pos_groups", 16),
        use_conv_dec=getattr(args, "use_conv_dec", True),
        n_extra=getattr(args, "N_extra", 1),
        n_self_dec=getattr(args, "N_self_dec", 5),
        n_mix_dec=getattr(args, "N_mix_dec", 2),
        d_decff=getattr(args, "d_decff", 1024),
        dec_n_head=getattr(args, "n_head", 8),
        dec_kernel_size=getattr(args, "dec_kernel_size", 3),
        dec_max_relative_len=getattr(args, "dec_max_relative_len", 8),
        dropout=getattr(args, "dropout", 0.1),
        src_trigger=getattr(args, "src_trigger", True),
        use_best_path=getattr(args, "use_best_path", False),
        ctc_alpha=getattr(args, "ctc_alpha", 1.0),
        att_alpha=getattr(args, "att_alpha", 1.0),
        label_smooth=getattr(args, "label_smooth", 0.1),
        padding_idx=getattr(args, "padding_idx", 0),
        freeze_encoder=getattr(args, "freeze_encoder", False),
        compute_dtype=getattr(args, "compute_dtype", jnp.float32),
    )


# ---------------------------------------------------------------------------
# fairseq checkpoint import (reference: hubert_task.py:75-117)
# ---------------------------------------------------------------------------


def load_fairseq_hubert(ckpt_path: str, params, prefix: str = "hub_base"):
    """Map a fairseq hubert checkpoint's weights onto our param tree.

    torch (CPU) deserializes the .pt; each tensor is converted to numpy and
    written into the flax state dict under `prefix`.
    """
    import torch
    from flax import serialization

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob)
    state = serialization.to_state_dict(params)
    tree = state["params"][prefix] if "params" in state else state[prefix]

    def put(dst_path, value):
        node = tree
        for k in dst_path[:-1]:
            node = node[k]
        expect = np.asarray(node[dst_path[-1]]).shape
        got = value.shape
        assert expect == got, f"{dst_path}: {expect} vs {got}"
        node[dst_path[-1]] = value.astype(np.float32)

    for key, tensor in sd.items():
        v = tensor.detach().numpy()
        parts = key.split(".")
        if key.startswith("feature_extractor.conv_layers"):
            i = int(parts[2])
            if parts[3] == "0":  # conv weight (C_out, C_in, K)
                put(("feature_extractor", f"conv{i}", "kernel"),
                    v.transpose(2, 1, 0))
            elif parts[3] == "2" and i == 0:  # group norm
                put(("feature_extractor", "gn0",
                     "scale" if parts[4] == "weight" else "bias"), v)
        elif key.startswith("post_extract_proj"):
            put(("post_extract_proj",
                 "kernel" if parts[1] == "weight" else "bias"),
                v.T if parts[1] == "weight" else v)
        elif key == "layer_norm.weight":
            put(("feat_ln", "scale"), v)
        elif key == "layer_norm.bias":
            put(("feat_ln", "bias"), v)
        elif key == "mask_emb":
            put(("mask_embed",), v)
        elif key.startswith("encoder.pos_conv"):
            if parts[2] == "bias":
                put(("encoder", "pos_conv", "conv", "bias"), v)
            elif parts[2] in ("weight_g", "weight_v"):
                # weight-norm: reconstruct on the fly when both present
                g = sd.get("encoder.pos_conv.0.weight_g")
                w = sd.get("encoder.pos_conv.0.weight_v")
                if g is not None and w is not None and parts[2] == "weight_v":
                    gv = g.detach().numpy()
                    wv = w.detach().numpy()
                    norm = np.linalg.norm(
                        wv.reshape(wv.shape[0], -1), axis=None)
                    full = wv * (gv / np.maximum(
                        np.linalg.norm(wv, axis=(0, 1), keepdims=True),
                        1e-8))
                    # torch conv1d weight (C_out, C_in/groups, K) -> flax
                    # (K, C_in/groups, C_out)
                    put(("encoder", "pos_conv", "conv", "kernel"),
                        full.transpose(2, 1, 0))
        elif key == "encoder.layer_norm.weight":
            put(("encoder", "ln", "scale"), v)
        elif key == "encoder.layer_norm.bias":
            put(("encoder", "ln", "bias"), v)
        elif key.startswith("encoder.layers"):
            i = int(parts[2])
            sub = parts[3]
            layer = ("encoder", f"layer{i}")
            is_w = parts[-1] == "weight"
            leaf = "kernel" if is_w else "bias"
            val = v.T if is_w else v
            if sub == "self_attn":
                proj = parts[4]  # k_proj/q_proj/v_proj/out_proj
                name = {"k_proj": "k", "q_proj": "q", "v_proj": "v",
                        "out_proj": "out"}[proj]
                put(layer + (name, leaf), val)
            elif sub == "self_attn_layer_norm":
                put(layer + ("attn_ln", "scale" if is_w else "bias"), v)
            elif sub == "fc1":
                put(layer + ("fc1", leaf), val)
            elif sub == "fc2":
                put(layer + ("fc2", leaf), val)
            elif sub == "final_layer_norm":
                put(layer + ("final_ln", "scale" if is_w else "bias"), v)
        # label_embs_concat / final_proj are pretraining-only; skipped like
        # the reference (hubert_task.py drops them when building HubertNAT).

    return serialization.from_state_dict(params, state)
