"""Chemistry layer tests: property stats, pure-Python SMILES syntax parser,
RDKit gating."""

import numpy as np
import pytest

from spmm_tpu.chem import PropertyStats, is_valid_smiles
from spmm_tpu.chem.featurizer import HAS_RDKIT, calculate_property, canonicalize
from spmm_tpu.chem.smiles import is_valid_syntax

VALID = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "N#Cc1cc(C#N)c(NCCc2cnc(N)s2)nc1Cl",
    "[Na+].[Cl-]",
    "C1CC1",
    "c1ccccc1",
    "C/C=C/C",
    "[13CH4]",
    "[NH4+]",
    "CC(C)(C)c1ccc(O)cc1",
    "C%10CCCCC%10",
    "[*]CC",
    "[C@@H](N)(C)C(=O)O",
]

INVALID = [
    "",
    "C(",
    "C)",
    "C1CC",          # unclosed ring
    "CC((C))",       # empty-ish branch start
    "=CC",           # bond at start
    "C=",            # dangling bond
    "C..C",          # empty component
    "Cq",            # unknown atom
    "[XyzzyQ]",      # bad bracket atom
    "[C",            # unclosed bracket
    "C(C",           # unclosed branch
    "C(=)C",         # bond then branch close
    " CC",           # leading whitespace
]


@pytest.mark.parametrize("s", VALID)
def test_valid_syntax(s):
    assert is_valid_syntax(s), s


@pytest.mark.parametrize("s", INVALID)
def test_invalid_syntax(s):
    assert not is_valid_syntax(s), s


def test_property_stats():
    stats = PropertyStats.load()
    assert stats.n_properties == 53
    assert stats.names[0] == "BalabanJ"
    assert stats.names[-1] == "QED"
    assert stats.index_of("TPSA") == 51
    pv = np.zeros(53, np.float32)
    n = stats.normalize(pv)
    back = stats.denormalize(n)
    np.testing.assert_allclose(back, pv, atol=1e-4)


def test_rdkit_gating():
    if HAS_RDKIT:
        pv = calculate_property("CC(=O)O")
        assert pv.shape == (53,)
    else:
        with pytest.raises(RuntimeError, match="RDKit is required"):
            calculate_property("CC(=O)O")
        # fallbacks stay usable
        assert canonicalize("CC(=O)O") == "CC(=O)O"
        assert canonicalize("C(") is None
        assert is_valid_smiles("CC(=O)O")
        assert not is_valid_smiles("C(")
