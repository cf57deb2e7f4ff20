"""Released-checkpoint golden gate (BASELINE.json north star).

One command proves a converted checkpoint end-to-end: load the torch
checkpoint into the REFERENCE torch graph, run the reference SMILES->PV
autoregressive decode (reference d_smiles2pv.py:14-26,61-70 — the exact load
path of the released ``checkpoint_SPMM.ckpt``, :109-165), run our JAX
``predict_pv`` on the same token ids, and assert the normalized predictions
agree within tolerance (default 1e-4).

Requires /root/reference and torch (the oracle side); the JAX side is the
production path.  Runs the moment the released checkpoint lands:

    python -m spmm_tpu.cli.convert_checkpoint \
        --torch_ckpt checkpoint_SPMM.ckpt --out ./ckpt_spmm \
        --verify examples/s2p_input.txt
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

REFERENCE_DIR = "/root/reference"


def _import_reference_xbert():
    """Import the reference xbert under the installed transformers (the
    reference pins 4.30; a few symbols moved to transformers.pytorch_utils)."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        apply_chunking_to_forward,
        find_pruneable_heads_and_indices,
        prune_linear_layer,
    )

    mu.apply_chunking_to_forward = apply_chunking_to_forward
    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_linear_layer = prune_linear_layer
    import xbert

    return xbert


def _ref_bert_config(ref, cfg):
    return ref.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, fusion_layer=cfg.fusion_layer,
        encoder_width=cfg.encoder_width,
        add_cross_attention=cfg.add_cross_attention, hidden_act="gelu",
        layer_norm_eps=1e-12, pad_token_id=0, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, autoregressive=0)


def _build_reference_model(state_dict, text_cfg, prop_cfg):
    """Reference SPMM inference submodules loaded exactly like
    d_smiles2pv.py:119-143 (drop queue keys, strict=False)."""
    import torch

    ref = _import_reference_xbert()

    class RefSPMM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            h = text_cfg.hidden_size
            self.text_encoder = ref.BertForMaskedLM(
                config=_ref_bert_config(ref, text_cfg))
            self.property_encoder = ref.BertForMaskedLM(
                config=_ref_bert_config(ref, prop_cfg)).bert
            self.property_embed = torch.nn.Linear(1, h)
            self.property_mtr_head = torch.nn.Sequential(
                torch.nn.Linear(h, h), torch.nn.GELU(),
                torch.nn.LayerNorm(h, 1e-12), torch.nn.Linear(h, 1))
            self.property_cls = torch.nn.Parameter(torch.zeros(1, 1, h))

    model = RefSPMM()
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in state_dict.items() if "queue" not in k}
    msg = model.load_state_dict(state, strict=False)
    missing = [k for k in msg.missing_keys if "position_ids" not in k]
    assert not missing, f"checkpoint missing keys: {missing[:5]}"
    return model.eval()


def _reference_predict_pv(model, ids, mask, n_properties):
    """The reference generate loop (d_smiles2pv.py:14-26,61-70)."""
    import torch

    ids = torch.from_numpy(np.asarray(ids)).long()
    mask = torch.from_numpy(np.asarray(mask)).long()
    b = ids.shape[0]
    with torch.no_grad():
        text_embeds = model.text_encoder.bert(
            ids, attention_mask=mask, return_dict=True, mode="text"
        ).last_hidden_state
        prop_input = model.property_cls.expand(b, -1, -1)
        preds = []
        for _ in range(n_properties):
            prop_embeds = model.property_encoder(
                inputs_embeds=prop_input, return_dict=True).last_hidden_state
            atts = torch.ones(prop_input.size()[:-1], dtype=torch.long)
            out = model.text_encoder.bert(
                encoder_embeds=prop_embeds, attention_mask=atts,
                encoder_hidden_states=text_embeds,
                encoder_attention_mask=mask, return_dict=True,
                is_decoder=True, mode="fusion").last_hidden_state
            pred = model.property_mtr_head(out).squeeze(-1)[:, -1]
            preds.append(pred)
            prop_input = torch.cat(
                [prop_input, model.property_embed(pred[:, None, None])], dim=1)
    return torch.stack(preds, dim=-1).numpy()


def verify_checkpoint(
    torch_ckpt: str,
    smiles: list[str],
    tolerance: float = 1e-4,
    text_cfg=None,
    prop_cfg=None,
    n_properties: Optional[int] = None,
) -> float:
    """Convert + dual-run SMILES->PV; returns the max abs deviation
    (normalized units) and raises if it exceeds ``tolerance``."""
    import jax.numpy as jnp

    from spmm_tpu.checkpoint.convert import load_torch_state_dict
    from spmm_tpu.checkpoint.io import load_spmm_params
    from spmm_tpu.configs import property_config, text_config
    from spmm_tpu.inference.smiles2pv import predict_pv
    from spmm_tpu.tokenizer import SmilesTokenizer, default_buckets

    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    n_properties = n_properties or 53

    tok = SmilesTokenizer()
    texts = [s if s.startswith("[CLS]") else "[CLS]" + s for s in smiles]
    ids, mask = tok.encode_batch(texts, max_len=100,
                                 buckets=default_buckets(100))

    params = load_spmm_params(torch_ckpt, text_cfg=text_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=False)
    got = np.asarray(predict_pv(params, jnp.asarray(ids), jnp.asarray(mask),
                                text_cfg=text_cfg, prop_cfg=prop_cfg,
                                n_properties=n_properties))

    state_dict = load_torch_state_dict(torch_ckpt)
    model = _build_reference_model(state_dict, text_cfg, prop_cfg)
    want = _reference_predict_pv(model, ids, mask, n_properties)

    dev = float(np.max(np.abs(got - want)))
    if dev > tolerance:
        worst = np.unravel_index(np.argmax(np.abs(got - want)), got.shape)
        raise AssertionError(
            f"checkpoint verification FAILED: max |dev| {dev:.2e} > "
            f"{tolerance:.0e} at (molecule, property)={worst}")
    return dev
