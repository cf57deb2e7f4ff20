"""SPMM task model: parameter assembly and the forward pieces shared by
pretraining and all downstream workloads.

Mirrors the reference SPMM module structure (reference SPMM_models.py:16-77):

  text_encoder        12L chem-BERT + LM head (fusion layers 6-11 cross-attend)
  property_encoder    6L chem-BERT, driven purely via inputs_embeds
  property_embed      Linear(1 -> 768) applied per scalar property
  property_cls        learned [1,1,768] CLS vector for the PV sequence
  property_mask       learned [1,1,768] mask/unk vector for masked properties
  property_proj/text_proj   768 -> 256 contrastive projections
  itm_head            Linear(1536 -> 2)
  property_mtr_head   Linear-GELU-LayerNorm-Linear(768 -> 1)
  + momentum twins of (property_encoder, property_proj, text_encoder,
    text_proj) and the 256x36864 feature queues (pretraining only)

All forwards are pure functions over an explicit params tree.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import BertArchConfig, property_config, text_config
from spmm_tpu.checkpoint.convert import _linear, _ln, convert_bert, convert_bert_mlm
from spmm_tpu.models import bert as jbert

Params = dict[str, Any]

N_PROPERTIES = 53


# --------------------------------------------------------------------------- #
# init / convert
# --------------------------------------------------------------------------- #


def init_spmm_params(
    rng: jax.Array,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    embed_dim: int = 256,
    with_pretrain_heads: bool = True,
) -> Params:
    """Random init of the full SPMM tree (HF-style init, normal(0.02))."""
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    h = text_cfg.hidden_size
    ks = jax.random.split(rng, 12)
    params: Params = {
        "text_encoder": jbert.init_mlm_params(ks[0], text_cfg),
        "property_encoder": jbert.init_bert_params(ks[1], prop_cfg),
        "property_embed": jbert._init_linear(ks[2], 1, h, text_cfg.initializer_range),
        "property_cls": jnp.zeros((1, 1, h), jnp.float32),
        "property_mask": jnp.zeros((1, 1, h), jnp.float32),
        "property_mtr_head": {
            "l1": jbert._init_linear(ks[3], h, h, text_cfg.initializer_range),
            "ln": jbert._init_ln(h),
            "l2": jbert._init_linear(ks[4], h, 1, text_cfg.initializer_range),
        },
    }
    if with_pretrain_heads:
        params.update({
            "property_proj": jbert._init_linear(ks[5], h, embed_dim, 0.02),
            "text_proj": jbert._init_linear(ks[6], h, embed_dim, 0.02),
            "itm_head": jbert._init_linear(ks[7], 2 * h, 2, 0.02),
        })
    return params


def convert_spmm_checkpoint(
    state: Mapping[str, np.ndarray],
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    with_pretrain_heads: bool = True,
    with_momentum: bool = False,
) -> Params:
    """Reference SPMM checkpoint state_dict -> spmm_tpu params tree.

    Handles the ``_unk`` -> ``_mask`` historical rename (reference
    d_regression.py:157-161).  ``queue*`` buffers are ignored here; the
    pretrain state carries queues separately.
    """
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    state = dict(state)
    for k in list(state):
        if "_unk" in k:
            state[k.replace("_unk", "_mask")] = state.pop(k)

    def mtr_head(prefix: str) -> Params:
        return {
            "l1": _linear(state, f"{prefix}.0"),
            "ln": _ln(state, f"{prefix}.2"),
            "l2": _linear(state, f"{prefix}.3"),
        }

    params: Params = {
        "text_encoder": convert_bert_mlm(state, text_cfg, prefix="text_encoder"),
        "property_encoder": convert_bert(state, prop_cfg, prefix="property_encoder"),
        "property_embed": _linear(state, "property_embed"),
        "property_cls": state["property_cls"],
        "property_mask": state["property_mask"],
        "property_mtr_head": mtr_head("property_mtr_head"),
    }
    if with_pretrain_heads:
        params["property_proj"] = _linear(state, "property_proj")
        params["text_proj"] = _linear(state, "text_proj")
        params["itm_head"] = _linear(state, "itm_head")
    if with_momentum:
        params["momentum"] = {
            "text_encoder": convert_bert_mlm(state, text_cfg, prefix="text_encoder_m"),
            "property_encoder": convert_bert(state, prop_cfg, prefix="property_encoder_m"),
            "property_proj": _linear(state, "property_proj_m"),
            "text_proj": _linear(state, "text_proj_m"),
        }
    return params


# --------------------------------------------------------------------------- #
# forward pieces
# --------------------------------------------------------------------------- #


def mtr_head_forward(p: Params, cfg: BertArchConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """property_mtr_head: Linear-GELU-LN-Linear -> scalar per position
    (reference SPMM_models.py:39-42)."""
    x = jbert.dense(p["l1"], hidden)
    x = jbert.gelu(x)
    x = jbert.layer_norm(p["ln"], x, cfg.layer_norm_eps)
    return jbert.dense(p["l2"], x)[..., 0]


def embed_properties(
    params: Params,
    values: jnp.ndarray,            # [B, 53] normalized property values
    mask: Optional[jnp.ndarray] = None,  # [B, 53] 1 = replace with mask vector
) -> jnp.ndarray:
    """property scalars -> [B, 54, H] input embeddings: per-scalar Linear(1->H)
    with masked positions replaced by the learned mask vector, then the
    learned CLS vector prepended (reference SPMM_models.py:82-88)."""
    b = values.shape[0]
    feat = jbert.dense(params["property_embed"], values[..., None])  # [B,53,H]
    if mask is not None:
        m = mask[..., None].astype(feat.dtype)
        feat = feat * (1.0 - m) + params["property_mask"] * m
    cls = jnp.broadcast_to(params["property_cls"], (b, 1, feat.shape[-1]))
    return jnp.concatenate([cls, feat], axis=1)


def encode_properties(
    params: Params,
    prop_cfg: BertArchConfig,
    prop_inputs: jnp.ndarray,       # [B, L, H] from embed_properties
    attention_mask: Optional[jnp.ndarray] = None,
    is_decoder: bool = False,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """6-layer property encoder over injected embeddings
    (reference SPMM_models.py:90; causal variant for MPM :242)."""
    return jbert.bert_forward(
        params["property_encoder"], prop_cfg,
        inputs_embeds=prop_inputs,
        attention_mask=attention_mask,
        is_decoder=is_decoder,
        mode="multi_modal",
        deterministic=deterministic,
        rng=rng,
        remat=remat,
    )


def encode_text(
    params: Params,
    text_cfg: BertArchConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Unimodal SMILES encoding: layers [0, fusion) (reference SPMM_models.py:94)."""
    return jbert.bert_forward(
        params["text_encoder"]["bert"], text_cfg,
        input_ids=input_ids,
        attention_mask=attention_mask,
        mode="text",
        deterministic=deterministic,
        rng=rng,
        remat=remat,
    )
