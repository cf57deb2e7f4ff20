"""Reaction-prediction model: encoder–decoder over two chem-BERT stacks
(reference SPMM_models_rxn.py:8-46).

  encoder  ("smiles_encoder", reference text_encoder2): 6-layer unimodal
           SMILES encoder, initialized from the pretrain checkpoint's text
           encoder with prefix strip (reference SPMM_models_rxn.py:16-29);
  decoder  ("decoder", reference text_encoder): 12-layer causal decoder whose
           fusion layers cross-attend over the encoder hiddens.

Training loss: teacher-forced next-token CE with ignore_index=0 — pads ARE
ignored here, unlike the pretrain MLM loss (reference SPMM_models_rxn.py:44).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import BertArchConfig, smiles_config, text_config
from spmm_tpu.checkpoint.convert import apply_key_surgery, convert_bert_mlm
from spmm_tpu.models import bert as jbert

Params = dict[str, Any]


def init_rxn_params(
    rng: jax.Array,
    decoder_cfg: Optional[BertArchConfig] = None,
    encoder_cfg: Optional[BertArchConfig] = None,
) -> Params:
    decoder_cfg = decoder_cfg or text_config()
    encoder_cfg = encoder_cfg or smiles_config()
    r1, r2 = jax.random.split(rng)
    return {
        "decoder": jbert.init_mlm_params(r1, decoder_cfg),
        "smiles_encoder": jbert.init_mlm_params(r2, encoder_cfg),
    }


def load_encoder_from_pretrain(
    params: Params,
    state: Mapping[str, np.ndarray],
    encoder_cfg: Optional[BertArchConfig] = None,
) -> Params:
    """Initialize the 6-layer SMILES encoder from a pretrain checkpoint's text
    encoder (strip ``text_encoder.`` prefix; layers 6-11 and cross-attention
    weights simply don't exist in the 6-layer config — the reference's
    strict=False load has the same effect; SPMM_models_rxn.py:16-29)."""
    encoder_cfg = encoder_cfg or smiles_config()
    sub = apply_key_surgery(state, strip_prefix="text_encoder.")
    enc = convert_bert_mlm(sub, encoder_cfg)
    return {**params, "smiles_encoder": enc}


def load_encoder_from_pretrain_tree(
    params: Params,
    pretrain_params: Params,
    encoder_cfg: Optional[BertArchConfig] = None,
) -> Params:
    """JAX-native counterpart of :func:`load_encoder_from_pretrain`: initialize
    the 6-layer SMILES encoder from an in-tree (Orbax) pretrain checkpoint's
    text encoder.  Semantics match the reference's prefix-strip strict=False
    load (SPMM_models_rxn.py:16-29): embeddings + the first
    ``encoder_cfg.num_hidden_layers`` layers + the MLM head transfer; the
    12-layer stack's upper (cross-attention) layers have no destination in
    the 6-layer no-fusion config and are dropped."""
    encoder_cfg = encoder_cfg or smiles_config()
    src = pretrain_params["text_encoder"]
    n = encoder_cfg.num_hidden_layers
    layers = [{k: v for k, v in layer.items() if k != "cross_attn"}
              for layer in src["bert"]["layers"][:n]]
    enc = {
        "bert": {"embeddings": src["bert"]["embeddings"], "layers": layers},
        "mlm_head": src["mlm_head"],
    }
    return {**params, "smiles_encoder": enc}


def encode_reactants(
    params: Params,
    encoder_cfg: BertArchConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """mode='text' on a 6-layer fusion_layer=6 config runs all six layers
    (reference SPMM_models_rxn.py:34)."""
    return jbert.bert_forward(
        params["smiles_encoder"]["bert"], encoder_cfg,
        input_ids=input_ids, attention_mask=attention_mask,
        mode="text", deterministic=deterministic, rng=rng,
    )


def rxn_loss(
    params: Params,
    decoder_cfg: BertArchConfig,
    encoder_cfg: BertArchConfig,
    src_ids: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_ids: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Teacher-forced next-token CE, ignore_index=0 (SPMM_models_rxn.py:31-46)."""
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    enc = encode_reactants(params, encoder_cfg, src_ids, src_mask,
                           deterministic, r1)
    logits = jbert.mlm_forward(
        params["decoder"], decoder_cfg,
        input_ids=tgt_ids, attention_mask=tgt_mask,
        encoder_hidden_states=enc, encoder_attention_mask=src_mask,
        is_decoder=True, deterministic=deterministic, rng=r2,
    )[:, :-1, :]
    labels = tgt_ids[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    keep = (labels != 0).astype(nll.dtype)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
