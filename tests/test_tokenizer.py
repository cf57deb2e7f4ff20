"""Tokenizer golden tests vs HF WordpieceTokenizer over the same 300-token vocab.

The reference constructs HF BertTokenizer(do_lower_case=False,
do_basic_tokenize=False) directly from the vocab file with
WordpieceTokenizer(max_input_chars_per_word=250) (reference
SPMM_pretrain.py:19-20).  Under transformers 4.30 a directly-constructed
tokenizer has an empty special-token trie, so the whole "[CLS]<smiles>" string
goes through greedy wordpiece ("[CLS]" is an ordinary vocab entry that anchors
the match; everything after is ##-continuations).  Modern transformers split
"[CLS]" out in tokenize(), producing [UNK]s — so the golden comparison here
uses hf.wordpiece_tokenizer.tokenize directly, which is the code path whose
output the reference model was actually trained on.
"""

import numpy as np
import pytest

from spmm_tpu.tokenizer import SmilesTokenizer, default_buckets, load_vocab

SAMPLE_SMILES = [
    "Cc1cc(C(=O)NCCN2CCCC2=O)c(C)n1-c1ccc(C#N)cc1",
    "N#Cc1cc(C#N)c(NCCc2cnc(N)s2)nc1Cl",
    "C=CC(C)(CC)C(=O)NC1CN(CCCC2CCC2)CC1O",
    "CC#CCNC1CCCN(C(=O)C(C)OCCOCC)C1",
    "CC(NC(=O)C(=O)NCCCCC#N)c1cccc(C(F)(F)F)c1",
    "C=CCN1CCC2C(CCCN2C(=O)Cc2c(C)n[nH]c2C)C1",
    "C=CCOCc1nn(CC2CC2)c2c1CN(CC(C)C(=O)OC)CC2",
    "CC(CCc1ccccc1)Nc1ccc(C#N)cc1F",
    "C=C1CCC(C(=O)NC(C)CC(C)NCC(N)=O)CC1",
    "C=C(C)CN(C)Cn1nc(N2CCCC2)n(-c2ccccc2Cl)c1=S",
    # reaction-style string (reactants>>product)
    "CCO.CC(=O)O>>CC(=O)OCC",
    "[Na+].[Cl-]",
]


@pytest.fixture(scope="module")
def hf_wordpiece(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    vocab = load_vocab()
    vocab_file = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    with open(vocab_file, "w") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    tok = transformers.BertTokenizer(
        vocab_file=str(vocab_file), do_lower_case=False, do_basic_tokenize=False
    )
    return transformers.WordpieceTokenizer(
        vocab=tok.vocab, unk_token=tok.unk_token, max_input_chars_per_word=250
    )


@pytest.fixture(scope="module")
def tok():
    return SmilesTokenizer()


def test_special_ids(tok):
    assert tok.pad_token_id == 0
    assert tok.unk_token_id == 1
    assert tok.cls_token_id == 2
    assert tok.sep_token_id == 3
    assert tok.vocab_size == 300


def test_cls_anchoring(tok):
    # without the literal [CLS] prefix a SMILES cannot match an initial piece
    assert tok.tokenize("CC(=O)O") == ["[UNK]"]
    pieces = tok.tokenize("[CLS]CC(=O)O")
    assert pieces[0] == "[CLS]"
    assert all(p.startswith("##") for p in pieces[1:])


@pytest.mark.parametrize("smiles", SAMPLE_SMILES)
def test_tokenize_matches_hf(tok, hf_wordpiece, smiles):
    text = "[CLS]" + smiles
    assert tok.tokenize(text) == hf_wordpiece.tokenize(text)


@pytest.mark.parametrize("smiles", SAMPLE_SMILES)
def test_encode_matches_hf(tok, hf_wordpiece, smiles):
    text = "[CLS]" + smiles
    pieces = hf_wordpiece.tokenize(text)
    expected = [2] + [tok.vocab[p] for p in pieces][:98] + [3]
    assert tok.encode(text, max_len=100, truncation=True) == expected


def test_no_truncation_by_default(tok, hf_wordpiece):
    # rxn driver passes max_length without truncation=True -> NO truncation
    # (reference d_rxn_prediction.py:39); note words >250 chars collapse to
    # [UNK] regardless (max_input_chars_per_word)
    text = "[CLS]" + ".".join(SAMPLE_SMILES[:5])
    pieces = hf_wordpiece.tokenize(text)
    got = tok.encode(text)
    assert got == [2] + [tok.vocab[p] for p in pieces] + [3]
    assert len(got) > 32


def test_truncation(tok):
    text = "[CLS]" + ".".join(SAMPLE_SMILES[:5])
    got = tok.encode(text, max_len=32, truncation=True)
    assert len(got) == 32
    assert got[0] == tok.cls_token_id and got[-1] == tok.sep_token_id
    assert got[:-1] == tok.encode(text)[:31]


def test_decode_roundtrip(tok):
    for smiles in SAMPLE_SMILES:
        ids = tok.encode("[CLS]" + smiles)
        if tok.unk_token_id not in ids:
            assert tok.decode(ids) == smiles


def test_decode_keeps_unk(tok):
    # reference decode only removes '[CLS]' (d_pv2smiles_single.py:105); [UNK]
    # stays in the output string
    ids = [tok.cls_token_id, tok.unk_token_id, tok.sep_token_id]
    assert tok.decode(ids) == "[UNK]"


def test_overlong_word_is_unk(tok):
    assert tok.tokenize("[CLS]" + "C" * 250) == ["[UNK]"]


def test_encode_batch_bucket_wider_than_buffer(tok):
    """Regression: a bucket equal to max_len is one column wider than the
    CLS-dropped buffer; the native fast path used to under-slice ids vs the
    bucket-wide mask (shape crash whenever a batch's longest sequence
    reached max_len-1).  Both paths must pad out to the bucket."""
    texts = ["[CLS]" + s for s in SAMPLE_SMILES[:4]]
    ids, mask = tok.encode_batch(texts, max_len=24, buckets=(24,))
    assert ids.shape == mask.shape == (4, 24)
    assert (ids[mask == 0] == 0).all()
    # content identical to the bucketless encoding where both are defined
    ref_ids, ref_mask = tok.encode_batch(texts, max_len=24)
    w = ref_ids.shape[1]
    assert (ids[:, :w] == ref_ids).all() and (mask[:, :w] == ref_mask).all()
    assert (ids[:, w:] == 0).all() and (mask[:, w:] == 0).all()


def test_encode_batch_shapes(tok):
    ids, mask = tok.encode_batch(
        ["[CLS]" + s for s in SAMPLE_SMILES[:4]],
        max_len=100,
        buckets=default_buckets(100),
    )
    assert ids.shape == mask.shape
    assert ids.shape[1] in default_buckets(100)
    # leading tokenizer-CLS dropped; first token is the string '[CLS]' token
    assert (ids[:, 0] == tok.cls_token_id).all()
    assert ids.dtype == np.int32
    assert (ids[mask == 0] == 0).all()
