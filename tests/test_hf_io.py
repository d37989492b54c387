"""HF checkpoint import + GPT-2/BERT tokenizer tests (synthetic artifacts)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from cassnat_asr_public_tpu.data.hf_tokenizers import (
    BertWordPieceTokenizer,
    GPT2BPETokenizer,
)
from cassnat_asr_public_tpu.nn.text_encoders import BertBackbone, GPT2Backbone
from cassnat_asr_public_tpu.models.hf_import import load_hf_bert, load_hf_gpt2


def test_gpt2_import(tmp_path):
    d, layers, vocab = 16, 2, 50
    model = GPT2Backbone(vocab_size=vocab, n_layers=layers, d_model=d,
                         n_head=4, max_positions=32)
    tokens = jnp.ones((1, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    sd = {"wte.weight": torch.randn(vocab, d),
          "wpe.weight": torch.randn(32, d),
          "ln_f.weight": torch.randn(d), "ln_f.bias": torch.randn(d)}
    for i in range(layers):
        sd[f"h.{i}.ln_1.weight"] = torch.randn(d)
        sd[f"h.{i}.ln_1.bias"] = torch.randn(d)
        sd[f"h.{i}.ln_2.weight"] = torch.randn(d)
        sd[f"h.{i}.ln_2.bias"] = torch.randn(d)
        sd[f"h.{i}.attn.c_attn.weight"] = torch.randn(d, 3 * d)
        sd[f"h.{i}.attn.c_attn.bias"] = torch.randn(3 * d)
        sd[f"h.{i}.attn.c_proj.weight"] = torch.randn(d, d)
        sd[f"h.{i}.attn.c_proj.bias"] = torch.randn(d)
        sd[f"h.{i}.mlp.c_fc.weight"] = torch.randn(d, 4 * d)
        sd[f"h.{i}.mlp.c_fc.bias"] = torch.randn(4 * d)
        sd[f"h.{i}.mlp.c_proj.weight"] = torch.randn(4 * d, d)
        sd[f"h.{i}.mlp.c_proj.bias"] = torch.randn(d)
    path = str(tmp_path / "gpt2.bin")
    torch.save(sd, path)
    # wrap params so prefix matches
    wrapped = {"params": {"text_encoder": params["params"]}}
    new = load_hf_gpt2(path, wrapped)
    from flax import serialization
    st = serialization.to_state_dict(new)
    np.testing.assert_allclose(
        st["params"]["text_encoder"]["wte"]["embedding"],
        sd["wte.weight"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        st["params"]["text_encoder"]["attn_qkv0"]["kernel"],
        sd["h.0.attn.c_attn.weight"].numpy(), rtol=1e-6)


def test_bert_import(tmp_path):
    d, layers, vocab = 16, 1, 60
    model = BertBackbone(vocab_size=vocab, n_layers=layers, d_model=d,
                         n_head=4, d_ff=32, max_positions=32)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 5), jnp.int32))
    sd = {"embeddings.word_embeddings.weight": torch.randn(vocab, d),
          "embeddings.position_embeddings.weight": torch.randn(32, d),
          "embeddings.token_type_embeddings.weight": torch.randn(2, d),
          "embeddings.LayerNorm.weight": torch.randn(d),
          "embeddings.LayerNorm.bias": torch.randn(d)}
    b = "encoder.layer.0"
    for name, shape in [("attention.self.query", (d, d)),
                        ("attention.self.key", (d, d)),
                        ("attention.self.value", (d, d)),
                        ("attention.output.dense", (d, d)),
                        ("intermediate.dense", (32, d)),
                        ("output.dense", (d, 32))]:
        sd[f"{b}.{name}.weight"] = torch.randn(*shape)
        sd[f"{b}.{name}.bias"] = torch.randn(shape[0])
    for ln in ["attention.output.LayerNorm", "output.LayerNorm"]:
        sd[f"{b}.{ln}.weight"] = torch.randn(d)
        sd[f"{b}.{ln}.bias"] = torch.randn(d)
    path = str(tmp_path / "bert.bin")
    torch.save(sd, path)
    wrapped = {"params": {"text_encoder": params["params"]}}
    new = load_hf_bert(path, wrapped)
    from flax import serialization
    st = serialization.to_state_dict(new)
    np.testing.assert_allclose(
        st["params"]["text_encoder"]["q0"]["kernel"],
        sd[f"{b}.attention.self.query.weight"].numpy().T, rtol=1e-6)


def test_gpt2_bpe_tokenizer(tmp_path):
    # toy byte-level BPE artifacts
    from cassnat_asr_public_tpu.data.hf_tokenizers import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    Gh = b2u[ord("h")]; Ge = b2u[ord("e")]; Gl = b2u[ord("l")]
    Go = b2u[ord("o")]; Gsp = b2u[ord(" ")]
    pieces = [Gh, Ge, Gl, Go, Gsp, Gh + Ge, Gl + Gl, Gh + Ge + Gl + Gl,
              Gh + Ge + Gl + Gl + Go, Gsp + Gh]
    encoder = {p: i for i, p in enumerate(pieces)}
    merges = ["#version", f"{Gh} {Ge}", f"{Gl} {Gl}",
              f"{Gh+Ge} {Gl+Gl}", f"{Gh+Ge+Gl+Gl} {Go}", f"{Gsp} {Gh}"]
    ej = str(tmp_path / "encoder.json")
    vb = str(tmp_path / "vocab.bpe")
    with open(ej, "w") as f:
        json.dump(encoder, f)
    with open(vb, "w") as f:
        f.write("\n".join(merges))
    tok = GPT2BPETokenizer(ej, vb)
    ids = tok.text2tokens("hello")
    assert ids == [encoder[Gh + Ge + Gl + Gl + Go]]
    assert tok.tokens2text(ids) == "hello"


def test_bert_wordpiece_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "wor", "##ld"]
    path = str(tmp_path / "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(vocab))
    tok = BertWordPieceTokenizer(path)
    ids = tok.text2tokens("Hello world")
    assert ids == [2, 4, 5, 6, 3]
    assert tok.tokens2text(ids) == "hello world"
