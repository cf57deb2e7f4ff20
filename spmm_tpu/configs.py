"""Architecture and run configuration.

Replaces the reference's triple-stack config system (argparse + inline dicts +
BERT JSON files; see reference SPMM_pretrain.py:51-65, config_bert.json) with
plain dataclasses. The three canonical architectures (12-layer SMILES
encoder/decoder with fusion layers, 6-layer property encoder, 6-layer SMILES
encoder) are exposed as constructors with values matching the reference
config_bert{,_property,_smiles}.json.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class BertArchConfig:
    """Architecture of one chem-BERT stack.

    Mirrors the fields the reference actually consumes from its BERT config
    JSONs (reference config_bert.json:5-22):
      - ``fusion_layer``: layers >= fusion_layer carry cross-attention and form
        the "fusion" section; layers below form the "text" section
        (reference xbert.py:462-465, 563-573).
      - ``encoder_width``: K/V projection input width for cross-attention
        (reference xbert.py:239-241).
    """

    vocab_size: int = 300
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    fusion_layer: int = 6
    encoder_width: int = 768
    add_cross_attention: bool = True
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    pad_token_id: int = 0
    # HF PreTrainedModel.init_weights ties cls.predictions.decoder.weight to
    # word_embeddings.weight (tie_word_embeddings defaults True and none of
    # the reference JSONs override it) — verified on the reference modules:
    # the two tensors share storage, so MLM-loss gradients flow into the
    # embedding table.  True means the param tree stores NO decoder weight
    # and the LM head contracts against the embedding table directly.
    tie_word_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json(cls, path: str) -> "BertArchConfig":
        """Load from a reference-style BERT config JSON (extra keys ignored)."""
        with open(path) as f:
            raw = json.load(f)
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in field_names}
        # reference JSON stores add_cross_attention as the string "True"
        if isinstance(kwargs.get("add_cross_attention"), str):
            kwargs["add_cross_attention"] = kwargs["add_cross_attention"].lower() == "true"
        return cls(**kwargs)


def text_config() -> BertArchConfig:
    """12-layer SMILES encoder/decoder; top 6 layers are fusion (cross-attn).

    Values from reference config_bert.json.
    """
    return BertArchConfig(
        vocab_size=300,
        num_hidden_layers=12,
        fusion_layer=6,
        add_cross_attention=True,
    )


def property_config() -> BertArchConfig:
    """6-layer property-vector encoder; no cross-attention layers.

    Values from reference config_bert_property.json (vocab_size=1: its word
    embeddings exist but are always bypassed via inputs_embeds; reference
    SPMM_models.py:82-90).
    """
    return BertArchConfig(
        vocab_size=1,
        num_hidden_layers=6,
        fusion_layer=6,
        add_cross_attention=False,
    )


def smiles_config() -> BertArchConfig:
    """6-layer unimodal SMILES encoder for reaction prediction.

    Values from reference config_bert_smiles.json.
    """
    return BertArchConfig(
        vocab_size=300,
        num_hidden_layers=6,
        fusion_layer=6,
        add_cross_attention=False,
    )


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """SPMM pretraining hyperparameters (reference SPMM_pretrain.py:51-65)."""

    embed_dim: int = 256
    batch_size: int = 96          # per-device batch
    temp: float = 0.07
    queue_size: int = 36864
    momentum: float = 0.995
    alpha: float = 0.4
    mask_prob: float = 0.5        # Bernoulli property-masking prob (SPMM_models.py:85)
    mpm_weight: float = 5.0       # MPM loss multiplier (SPMM_models.py:256)
    max_text_len: int = 100
    n_properties: int = 53
    lr: float = 5e-5
    min_lr: float = 1e-5
    warmup_lr: float = 5e-5
    weight_decay: float = 0.02
    epochs: int = 30
    warmup_epochs: int = 20       # interpreted as warmup *chunks* of 100 steps
    grad_clip: float = 5.0
    bf16_compute: bool = False    # bf16 encoder compute (reference: fp16 AMP)
    remat: bool = False           # objective+layer rematerialization (memory for FLOPs)
    bf16_moments: bool = False    # bf16 Adam first moment (mu) — halves one
                                  # optimizer-state copy; second moment stays
                                  # fp32 (its dynamic range matters)
    zero1: bool = False           # ZeRO-1: shard optimizer state + EMA over
                                  # the dp mesh (params stay replicated;
                                  # GSPMD all-gathers the updates)


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    """Downstream fine-tune hyperparameters (reference d_classification.py:198-207 etc.)."""

    lr: float = 3e-5
    min_lr: float = 5e-6
    warmup_lr: float = 0.5e-5
    weight_decay: float = 0.02
    epochs: int = 10
    warmup_epochs: int = 1
    batch_size_train: int = 16
    batch_size_test: int = 64
    max_text_len: int = 100
    step_size: int = 50           # warmup chunk size (50 for cls, 100 for reg/rxn)
    seed: Optional[int] = None
