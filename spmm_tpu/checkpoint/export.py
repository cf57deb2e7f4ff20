"""JAX-param-tree -> PyTorch-checkpoint exporter (the converter's inverse).

Completes the two-way migration story: a model pretrained or fine-tuned in
spmm_tpu can be handed back to the reference PyTorch code (or any HF-BERT
tooling).  Key names follow the reference state_dict exactly — validated
by loading an exported checkpoint into the reference torch modules with
``load_state_dict`` and asserting zero unexpected keys, and by the exact
``convert(export(params)) == params`` roundtrip
(tests/test_spmm_export.py).

Mapping notes (inverses of checkpoint/convert.py):
  - Linear weights transpose back [in, out] -> [out, in];
  - the LM-head decoder bias is emitted under BOTH of the reference's
    aliased names, ``cls.predictions.bias`` and
    ``cls.predictions.decoder.bias`` (reference xbert.py:686-691);
  - ``property_mtr_head`` flattens to the reference's Sequential indices
    ``.0/.2/.3`` (reference SPMM_models.py:39-42);
  - momentum twins export under the reference's ``_m`` suffixes when the
    tree carries them (reference SPMM_models.py:47-62).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from spmm_tpu.configs import BertArchConfig, property_config, text_config

Params = dict[str, Any]


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _put_linear(out: dict, prefix: str, p: Params) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["w"]).T)
    out[f"{prefix}.bias"] = _np(p["b"])


def _put_ln(out: dict, prefix: str, p: Params) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def export_bert(out: dict, tree: Params, cfg: BertArchConfig,
                prefix: str = "bert") -> None:
    """spmm_tpu bert tree -> HF-style BertModel keys (inverse of
    convert.convert_bert)."""
    emb = tree["embeddings"]
    out[f"{prefix}.embeddings.word_embeddings.weight"] = _np(emb["word"])
    out[f"{prefix}.embeddings.position_embeddings.weight"] = _np(
        emb["position"])
    out[f"{prefix}.embeddings.token_type_embeddings.weight"] = _np(
        emb["token_type"])
    _put_ln(out, f"{prefix}.embeddings.LayerNorm", emb["ln"])
    for i, layer in enumerate(tree["layers"]):
        lp = f"{prefix}.encoder.layer.{i}"
        sa = layer["self_attn"]
        _put_linear(out, f"{lp}.attention.self.query", sa["q"])
        _put_linear(out, f"{lp}.attention.self.key", sa["k"])
        _put_linear(out, f"{lp}.attention.self.value", sa["v"])
        _put_linear(out, f"{lp}.attention.output.dense", sa["out"])
        _put_ln(out, f"{lp}.attention.output.LayerNorm", sa["ln"])
        if "cross_attn" in layer:
            ca = layer["cross_attn"]
            _put_linear(out, f"{lp}.crossattention.self.query", ca["q"])
            _put_linear(out, f"{lp}.crossattention.self.key", ca["k"])
            _put_linear(out, f"{lp}.crossattention.self.value", ca["v"])
            _put_linear(out, f"{lp}.crossattention.output.dense", ca["out"])
            _put_ln(out, f"{lp}.crossattention.output.LayerNorm", ca["ln"])
        mlp = layer["mlp"]
        _put_linear(out, f"{lp}.intermediate.dense", mlp["up"])
        _put_linear(out, f"{lp}.output.dense", mlp["down"])
        _put_ln(out, f"{lp}.output.LayerNorm", mlp["ln"])


def export_bert_mlm(out: dict, tree: Params, cfg: BertArchConfig,
                    prefix: str = "") -> None:
    """{bert, mlm_head} tree -> BertForMaskedLM keys (inverse of
    convert.convert_bert_mlm)."""
    dot = f"{prefix}." if prefix else ""
    export_bert(out, tree["bert"], cfg, prefix=f"{dot}bert")
    head = tree["mlm_head"]
    _put_linear(out, f"{dot}cls.predictions.transform.dense",
                head["transform"])
    _put_ln(out, f"{dot}cls.predictions.transform.LayerNorm", head["ln"])
    if "w" in head["decoder"]:
        dec_w = np.ascontiguousarray(_np(head["decoder"]["w"]).T)
    else:
        # tied head (the reference configuration): the decoder weight IS
        # the embedding table — emit it under the decoder name too, exactly
        # like torch.save of a tied module writes the shared tensor twice
        dec_w = _np(tree["bert"]["embeddings"]["word"])
    out[f"{dot}cls.predictions.decoder.weight"] = dec_w
    # the reference aliases the decoder bias to cls.predictions.bias
    # (xbert.py:686-691): emit both names so either loader finds it
    out[f"{dot}cls.predictions.decoder.bias"] = _np(head["decoder"]["b"])
    out[f"{dot}cls.predictions.bias"] = _np(head["decoder"]["b"])


def export_spmm_state_dict(
    params: Params,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
) -> dict[str, np.ndarray]:
    """Full spmm_tpu SPMM params tree -> reference-named state_dict (numpy).

    Exports exactly the surface the tree carries: the pretrain projection
    heads and the momentum twins appear iff present (fine-tuned /
    inference-only trees export without them).  Queues/optimizer state are
    training state, not module weights — export them via the Orbax
    checkpoint instead.
    """
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    out: dict[str, np.ndarray] = {}
    export_bert_mlm(out, params["text_encoder"], text_cfg,
                    prefix="text_encoder")
    export_bert(out, params["property_encoder"], prop_cfg,
                prefix="property_encoder")
    _put_linear(out, "property_embed", params["property_embed"])
    out["property_cls"] = _np(params["property_cls"])
    out["property_mask"] = _np(params["property_mask"])
    mtr = params["property_mtr_head"]
    _put_linear(out, "property_mtr_head.0", mtr["l1"])
    _put_ln(out, "property_mtr_head.2", mtr["ln"])
    _put_linear(out, "property_mtr_head.3", mtr["l2"])
    for name in ("property_proj", "text_proj", "itm_head"):
        if name in params:
            _put_linear(out, name, params[name])
    if "momentum" in params:
        m = params["momentum"]
        export_bert_mlm(out, m["text_encoder"], text_cfg,
                        prefix="text_encoder_m")
        export_bert(out, m["property_encoder"], prop_cfg,
                    prefix="property_encoder_m")
        _put_linear(out, "property_proj_m", m["property_proj"])
        _put_linear(out, "text_proj_m", m["text_proj"])
    return out


def save_torch_checkpoint(path: str, params: Params,
                          text_cfg: Optional[BertArchConfig] = None,
                          prop_cfg: Optional[BertArchConfig] = None) -> None:
    """Write a reference-loadable ``{"state_dict": ...}`` torch checkpoint."""
    import torch

    state = export_spmm_state_dict(params, text_cfg, prop_cfg)
    # np.array copies: jax buffers can surface as non-writable views, which
    # torch.from_numpy would wrap with an undefined-behavior warning
    torch.save({"state_dict": {k: torch.from_numpy(np.array(v))
                               for k, v in state.items()}}, path)
