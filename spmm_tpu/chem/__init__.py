"""Chemistry/featurization layer (host-side).

RDKit — a C++ toolkit — is the reference's featurization engine (reference
calc_property.py, dataset.py).  It stays host-side here too (SURVEY §2.2) but
every entry point is gated: without RDKit installed, descriptor computation
raises a clear error (or consumes precomputed property files), and
validity/canonicalization fall back to the pure-Python SMILES parser in
spmm_tpu.chem.smiles.
"""

from spmm_tpu.chem.normalize import PropertyStats
from spmm_tpu.chem.featurizer import (
    HAS_RDKIT,
    calculate_property,
    calculate_properties_batch,
    canonicalize,
    is_valid_smiles,
)

__all__ = [
    "PropertyStats",
    "HAS_RDKIT",
    "calculate_property",
    "calculate_properties_batch",
    "canonicalize",
    "is_valid_smiles",
]
