"""spmm_tpu — a TPU-native (JAX/XLA/Pallas) framework for bidirectional
structure–property multi-modal molecular foundation models.

Re-designed from scratch for TPU hardware with the capabilities of the SPMM
reference implementation (jinhojsk515/spmm): pretraining with contrastive /
matching / causal-LM / masked-property objectives, SMILES<->property-vector
generation, MoleculeNet fine-tuning, and USPTO reaction prediction.

Layout:
  spmm_tpu.configs     — architecture + run configuration (dataclasses)
  spmm_tpu.tokenizer   — wordpiece SMILES tokenizer (host-side, static-shape)
  spmm_tpu.models      — pure-functional models: chem BERT core, SPMM, rxn, downstream
  spmm_tpu.ops         — Pallas TPU kernels + XLA fallbacks
  spmm_tpu.parallel    — mesh / sharding / collective helpers
  spmm_tpu.chem        — featurization (RDKit-gated) + pure-python SMILES utils
  spmm_tpu.data        — host input pipelines
  spmm_tpu.training    — jitted train steps, optimizers, LR schedules
  spmm_tpu.inference   — scan/beam decoders (KV-cached)
  spmm_tpu.checkpoint  — Orbax IO + PyTorch checkpoint converter
"""

__version__ = "0.1.0"

from spmm_tpu.configs import BertArchConfig, text_config, property_config, smiles_config

__all__ = [
    "BertArchConfig",
    "text_config",
    "property_config",
    "smiles_config",
    "__version__",
]
