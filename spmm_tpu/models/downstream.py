"""Downstream MoleculeNet models: classification / multi-label / regression.

The reference builds these by loading the 12-layer text encoder and replacing
layers >= fusion_layer with nn.Identity, leaving the 6-layer unimodal SMILES
encoder (reference d_classification.py:26-49, d_regression.py:24-49,
d_classification_multilabel.py:25-47).  Here that truncation is structural:
the params tree only carries the first ``fusion_layer`` layers and the
forward runs mode='text'.

Heads (torch-default Linear init, matching the reference's un-pretrained
heads):
  classification  Linear(H, H)  - GELU - Linear(H, 2);    CE loss
  multilabel      Linear(H, H)  - GELU - Linear(H, n);    BCE(sigmoid) loss
  regression      Linear(H, 2H) - GELU - Linear(2H, 1);   MSE loss
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import BertArchConfig, text_config
from spmm_tpu.checkpoint.convert import convert_bert
from spmm_tpu.models import bert as jbert

Params = dict[str, Any]

TASKS = ("classification", "multilabel", "regression")


def truncated_text_config(cfg: Optional[BertArchConfig] = None) -> BertArchConfig:
    """12-layer text config truncated to its unimodal section."""
    cfg = cfg or text_config()
    return dataclasses.replace(
        cfg, num_hidden_layers=cfg.fusion_layer, add_cross_attention=False)


def _torch_linear_init(rng, d_in, d_out):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) like torch.nn.Linear defaults."""
    bound = 1.0 / np.sqrt(d_in)
    r1, r2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(r1, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(r2, (d_out,), jnp.float32, -bound, bound),
    }


def init_head(rng: jax.Array, task: str, hidden: int, n_output: int = 2) -> Params:
    r1, r2 = jax.random.split(rng)
    if task == "classification":
        return {"l1": _torch_linear_init(r1, hidden, hidden),
                "l2": _torch_linear_init(r2, hidden, n_output)}
    if task == "multilabel":
        return {"l1": _torch_linear_init(r1, hidden, hidden),
                "l2": _torch_linear_init(r2, hidden, n_output)}
    if task == "regression":
        return {"l1": _torch_linear_init(r1, hidden, hidden * 2),
                "l2": _torch_linear_init(r2, hidden * 2, 1)}
    raise ValueError(f"unknown task {task!r}")


def init_downstream_params(
    rng: jax.Array,
    task: str,
    cfg: Optional[BertArchConfig] = None,
    n_output: int = 2,
) -> Params:
    tcfg = truncated_text_config(cfg)
    r1, r2 = jax.random.split(rng)
    return {
        "encoder": jbert.init_bert_params(r1, tcfg),
        "head": init_head(r2, task, tcfg.hidden_size, n_output),
    }


def load_encoder_from_pretrain(
    params: Params,
    state: Mapping[str, np.ndarray],
    cfg: Optional[BertArchConfig] = None,
) -> Params:
    """Load the pretrain checkpoint's text encoder, keeping only the unimodal
    layers (the reference's strict=False load over Identity-replaced layers
    has the same effect; d_classification.py:145-151)."""
    tcfg = truncated_text_config(cfg)
    state = dict(state)
    for k in list(state):
        if "_unk" in k:  # historical rename (reference d_regression.py:157-161)
            state[k.replace("_unk", "_mask")] = state.pop(k)
    enc = convert_bert(state, tcfg, prefix="text_encoder.bert")
    return {**params, "encoder": enc}


def downstream_forward(
    params: Params,
    cfg: BertArchConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """CLS hidden -> head output (logits / regression value)."""
    tcfg = truncated_text_config(cfg)
    hidden = jbert.bert_forward(
        params["encoder"], tcfg, input_ids=input_ids,
        attention_mask=attention_mask, mode="text",
        deterministic=deterministic, rng=rng)[:, 0]
    x = jbert.dense(params["head"]["l1"], hidden)
    x = jbert.gelu(x)
    return jbert.dense(params["head"]["l2"], x)


def downstream_loss(
    params: Params,
    cfg: BertArchConfig,
    task: str,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    targets: jnp.ndarray,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    out = downstream_forward(params, cfg, input_ids, attention_mask,
                             deterministic=rng is None, rng=rng)
    if task == "classification":
        logp = jax.nn.log_softmax(out, axis=-1)
        return -jnp.take_along_axis(
            logp, targets[:, None].astype(jnp.int32), axis=1).mean()
    if task == "multilabel":
        p = jax.nn.sigmoid(out)
        eps = 1e-12
        return -(targets * jnp.log(p + eps)
                 + (1 - targets) * jnp.log(1 - p + eps)).mean()
    if task == "regression":
        return jnp.mean(jnp.square(out[:, 0] - targets))
    raise ValueError(f"unknown task {task!r}")
