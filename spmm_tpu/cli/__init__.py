"""CLI entry points mirroring the reference d_*.py scripts.

Run as ``python -m spmm_tpu.cli.<workload>``:
  pretrain, smiles2pv, pv2smiles_single, pv2smiles_batched,
  classification, classification_multilabel, regression, rxn_prediction,
  convert_checkpoint
"""
