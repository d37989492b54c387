"""HuggingFace/OpenAI checkpoint import for the LMNAT text encoders.

The reference ships TF-checkpoint importers for its GPT-2 and BERT ports
(reference: src/models/gpt2/load_tf_weight.py, src/models/bert/load_tf_weight.py).
Here the equivalents map HF-format *torch* state dicts (pytorch_model.bin /
model.safetensors already downloaded locally — this image has no egress)
onto the clean-room flax backbones in nn/text_encoders.py.
"""

from typing import Dict

import numpy as np


def _load_torch_state(path: str) -> Dict[str, "np.ndarray"]:
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            return load_file(path)
        except ImportError as e:
            raise RuntimeError("safetensors not available; convert to .bin"
                               ) from e
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob)
    return {k: v.detach().numpy() for k, v in sd.items()}


def load_hf_gpt2(ckpt_path: str, params, prefix: str = "text_encoder"):
    """Map HF gpt2 keys (wte/wpe/h.N.attn.c_attn ...) onto GPT2Backbone.

    HF GPT-2 uses Conv1D (weights already (in, out)) so no transpose.
    """
    from flax import serialization
    sd = _load_torch_state(ckpt_path)
    sd = {k.replace("transformer.", ""): v for k, v in sd.items()}
    state = serialization.to_state_dict(params)
    tree = state["params"][prefix] if "params" in state else state[prefix]

    def put(path, v):
        node = tree
        for k in path[:-1]:
            node = node[k]
        assert np.asarray(node[path[-1]]).shape == v.shape, \
            f"{path}: {np.asarray(node[path[-1]]).shape} vs {v.shape}"
        node[path[-1]] = v.astype(np.float32)

    put(("wte", "embedding"), sd["wte.weight"])
    put(("wpe", "embedding"), sd["wpe.weight"])
    put(("ln_f", "scale"), sd["ln_f.weight"])
    put(("ln_f", "bias"), sd["ln_f.bias"])
    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        put((f"ln1_{i}", "scale"), sd[f"h.{i}.ln_1.weight"])
        put((f"ln1_{i}", "bias"), sd[f"h.{i}.ln_1.bias"])
        put((f"ln2_{i}", "scale"), sd[f"h.{i}.ln_2.weight"])
        put((f"ln2_{i}", "bias"), sd[f"h.{i}.ln_2.bias"])
        put((f"attn_qkv{i}", "kernel"), sd[f"h.{i}.attn.c_attn.weight"])
        put((f"attn_qkv{i}", "bias"), sd[f"h.{i}.attn.c_attn.bias"])
        put((f"attn_out{i}", "kernel"), sd[f"h.{i}.attn.c_proj.weight"])
        put((f"attn_out{i}", "bias"), sd[f"h.{i}.attn.c_proj.bias"])
        put((f"mlp_up{i}", "kernel"), sd[f"h.{i}.mlp.c_fc.weight"])
        put((f"mlp_up{i}", "bias"), sd[f"h.{i}.mlp.c_fc.bias"])
        put((f"mlp_down{i}", "kernel"), sd[f"h.{i}.mlp.c_proj.weight"])
        put((f"mlp_down{i}", "bias"), sd[f"h.{i}.mlp.c_proj.bias"])
        i += 1
    return serialization.from_state_dict(params, state)


def load_hf_bert(ckpt_path: str, params, prefix: str = "text_encoder"):
    """Map HF bert-base keys onto BertBackbone (Linear weights transposed)."""
    from flax import serialization
    sd = _load_torch_state(ckpt_path)
    sd = {k.replace("bert.", ""): v for k, v in sd.items()}
    state = serialization.to_state_dict(params)
    tree = state["params"][prefix] if "params" in state else state[prefix]

    def put(path, v):
        node = tree
        for k in path[:-1]:
            node = node[k]
        assert np.asarray(node[path[-1]]).shape == v.shape, \
            f"{path}: {np.asarray(node[path[-1]]).shape} vs {v.shape}"
        node[path[-1]] = v.astype(np.float32)

    put(("wte", "embedding"), sd["embeddings.word_embeddings.weight"])
    put(("wpe", "embedding"), sd["embeddings.position_embeddings.weight"])
    put(("tte", "embedding"), sd["embeddings.token_type_embeddings.weight"])
    put(("emb_ln", "scale"), sd["embeddings.LayerNorm.weight"])
    put(("emb_ln", "bias"), sd["embeddings.LayerNorm.bias"])
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        base = f"encoder.layer.{i}"
        put((f"q{i}", "kernel"), sd[f"{base}.attention.self.query.weight"].T)
        put((f"q{i}", "bias"), sd[f"{base}.attention.self.query.bias"])
        put((f"k{i}", "kernel"), sd[f"{base}.attention.self.key.weight"].T)
        put((f"k{i}", "bias"), sd[f"{base}.attention.self.key.bias"])
        put((f"v{i}", "kernel"), sd[f"{base}.attention.self.value.weight"].T)
        put((f"v{i}", "bias"), sd[f"{base}.attention.self.value.bias"])
        put((f"attn_out{i}", "kernel"),
            sd[f"{base}.attention.output.dense.weight"].T)
        put((f"attn_out{i}", "bias"),
            sd[f"{base}.attention.output.dense.bias"])
        put((f"attn_ln{i}", "scale"),
            sd[f"{base}.attention.output.LayerNorm.weight"])
        put((f"attn_ln{i}", "bias"),
            sd[f"{base}.attention.output.LayerNorm.bias"])
        put((f"fc1_{i}", "kernel"), sd[f"{base}.intermediate.dense.weight"].T)
        put((f"fc1_{i}", "bias"), sd[f"{base}.intermediate.dense.bias"])
        put((f"fc2_{i}", "kernel"), sd[f"{base}.output.dense.weight"].T)
        put((f"fc2_{i}", "bias"), sd[f"{base}.output.dense.bias"])
        put((f"out_ln{i}", "scale"), sd[f"{base}.output.LayerNorm.weight"])
        put((f"out_ln{i}", "bias"), sd[f"{base}.output.LayerNorm.bias"])
        i += 1
    return serialization.from_state_dict(params, state)
