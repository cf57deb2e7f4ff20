"""PyTorch-checkpoint -> JAX-param-tree converter.

Maps the reference's HF-style ``state_dict`` names onto spmm_tpu's explicit
param pytrees, replicating the per-task "key surgery" the reference performs
at load time (SURVEY §2.4):

  - drop ``queue*`` buffers            (reference d_smiles2pv.py:137-139)
  - drop ``property_encoder…word_embeddings`` (d_pv2smiles_batched.py:138-141)
  - rename ``_unk`` -> ``_mask``       (d_regression.py:157-161)
  - strip ``text_encoder.`` prefix for the rxn SMILES encoder
    (SPMM_models_rxn.py:22-27)

Linear weights are transposed ([out, in] -> [in, out]); the LM-head decoder
bias comes from the aliased ``cls.predictions.bias`` (reference
xbert.py:686-691).

Tensors arrive as numpy (via ``torch.Tensor.numpy()``); torch is only
imported inside ``load_torch_state_dict`` so the converter itself stays
torch-free for pre-extracted numpy dicts.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from spmm_tpu.configs import BertArchConfig

Params = dict[str, Any]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a PyTorch .ckpt/.pth and return {name: float32 numpy array}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt.get("model", ckpt))
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in state.items() if hasattr(v, "detach")}


def apply_key_surgery(
    state: Mapping[str, np.ndarray],
    drop_queue: bool = True,
    drop_property_word_embeddings: bool = False,
    rename_unk_to_mask: bool = True,
    drop_momentum: bool = False,
    drop_property: bool = False,
    strip_prefix: str | None = None,
) -> dict[str, np.ndarray]:
    """Reference load-time key surgery as explicit converter rules."""
    out: dict[str, np.ndarray] = {}
    for k, v in state.items():
        if drop_queue and "queue" in k:
            continue
        if drop_property_word_embeddings and (
            "word_embeddings" in k and "property_encoder" in k
        ):
            continue
        if drop_momentum and "_m." in k:
            continue
        if drop_property and "property" in k:
            continue
        if rename_unk_to_mask and "_unk" in k:
            k = k.replace("_unk", "_mask")
        if strip_prefix:
            if not k.startswith(strip_prefix):
                continue
            k = k[len(strip_prefix):]
        out[k] = v
    return out


# --------------------------------------------------------------------------- #
# per-module converters
# --------------------------------------------------------------------------- #


def _linear(state: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "w": np.ascontiguousarray(state[f"{prefix}.weight"].T),
        "b": state[f"{prefix}.bias"],
    }


def _ln(state: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}


def convert_bert(
    state: Mapping[str, np.ndarray], cfg: BertArchConfig, prefix: str = "bert"
) -> Params:
    """BertModel weights (embeddings + layer stack) -> spmm_tpu bert tree."""
    p = prefix
    emb = {
        "word": state[f"{p}.embeddings.word_embeddings.weight"],
        "position": state[f"{p}.embeddings.position_embeddings.weight"],
        "token_type": state[f"{p}.embeddings.token_type_embeddings.weight"],
        "ln": _ln(state, f"{p}.embeddings.LayerNorm"),
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{p}.encoder.layer.{i}"
        layer: Params = {
            "self_attn": {
                "q": _linear(state, f"{lp}.attention.self.query"),
                "k": _linear(state, f"{lp}.attention.self.key"),
                "v": _linear(state, f"{lp}.attention.self.value"),
                "out": _linear(state, f"{lp}.attention.output.dense"),
                "ln": _ln(state, f"{lp}.attention.output.LayerNorm"),
            },
            "mlp": {
                "up": _linear(state, f"{lp}.intermediate.dense"),
                "down": _linear(state, f"{lp}.output.dense"),
                "ln": _ln(state, f"{lp}.output.LayerNorm"),
            },
        }
        if cfg.add_cross_attention and i >= cfg.fusion_layer:
            layer["cross_attn"] = {
                "q": _linear(state, f"{lp}.crossattention.self.query"),
                "k": _linear(state, f"{lp}.crossattention.self.key"),
                "v": _linear(state, f"{lp}.crossattention.self.value"),
                "out": _linear(state, f"{lp}.crossattention.output.dense"),
                "ln": _ln(state, f"{lp}.crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    return {"embeddings": emb, "layers": layers}


def convert_bert_mlm(
    state: Mapping[str, np.ndarray], cfg: BertArchConfig, prefix: str = ""
) -> Params:
    """BertForMaskedLM weights -> {bert, mlm_head} tree.

    ``prefix`` is the state_dict scope of the BertForMaskedLM module, e.g.
    ``"text_encoder"`` inside the full SPMM checkpoint.

    With ``cfg.tie_word_embeddings`` (the reference's actual configuration —
    HF init_weights ties decoder.weight to word_embeddings.weight, so a
    reference-saved checkpoint stores the SAME tensor under both names) the
    tree keeps no decoder weight; only the aliased bias
    (``cls.predictions.bias``, reference xbert.py:686-691) is loaded.
    """
    dot = f"{prefix}." if prefix else ""
    if cfg.tie_word_embeddings:
        decoder: Params = {"b": state[f"{dot}cls.predictions.bias"]}
    else:
        decoder = {
            "w": np.ascontiguousarray(
                state[f"{dot}cls.predictions.decoder.weight"].T
            ),
            "b": state[f"{dot}cls.predictions.bias"],
        }
    return {
        "bert": convert_bert(state, cfg, prefix=f"{dot}bert"),
        "mlm_head": {
            "transform": _linear(state, f"{dot}cls.predictions.transform.dense"),
            "ln": _ln(state, f"{dot}cls.predictions.transform.LayerNorm"),
            "decoder": decoder,
        },
    }
