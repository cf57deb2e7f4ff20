"""Native C++ wordpiece vs the pure-Python tokenizer (builds on demand)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from spmm_tpu.tokenizer import SmilesTokenizer, native_available

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def native():
    if not native_available():
        if shutil.which("g++") is None and shutil.which("make") is None:
            pytest.skip("no C++ toolchain and no prebuilt libspmm_host.so")
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True)
    from spmm_tpu.tokenizer import NativeWordpiece

    return NativeWordpiece()


SAMPLES = [
    "[CLS]CC(=O)Oc1ccccc1C(=O)O",
    "[CLS]N#Cc1cc(C#N)c(NCCc2cnc(N)s2)nc1Cl",
    "[CLS]C",
    "[CLS]" + "C" * 300,        # > max_input_chars_per_word -> [UNK]
    "[CLS][Na+].[Cl-]",
    "[CLS]CCO.CC(=O)O>>CC(=O)OCC",
    "",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_matches_python(native, text):
    tok = SmilesTokenizer()
    assert native.encode(text) == tok.encode(text)
    assert native.encode(text, max_len=16, truncation=True) == \
        tok.encode(text, max_len=16, truncation=True)


def test_batch_matches_python(native):
    tok = SmilesTokenizer()
    ids, lens = native.encode_batch_padded(SAMPLES, 32)
    assert ids.shape == (len(SAMPLES), 32)
    for i, s in enumerate(SAMPLES):
        ref = tok.encode(s, max_len=32, truncation=True)
        assert list(ids[i][: lens[i]]) == ref
        assert (ids[i][lens[i]:] == 0).all()
