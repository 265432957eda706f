"""Native C++ WordPiece tokenizer: parity with HF BertTokenizer.

The reference's tokenization rides HF's Rust core (utils/hf_models.py);
our native/wordpiece.cpp must match its output on the covered text class
(uncased English), verified against the slow reference BertTokenizer.
"""

import os

import numpy as np
import pytest

from transformer_quantization_tpu.utils import native as N

VOCAB = """[PAD]
[unused0]
[UNK]
[CLS]
[SEP]
[MASK]
the
quick
brown
fox
jump
##s
##ed
##ing
over
lazy
dog
un
##aff
##able
,
.
!
?
'
hello
world
a
an
and
é
model
quant
##ization
""".strip().split("\n")


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def wp(vocab_path):
    if not N.wordpiece_available():
        pytest.skip("g++ unavailable")
    return N.WordPieceTokenizer(vocab_path)


def hf_tok(vocab_path):
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file=vocab_path, do_lower_case=True)


CASES = [
    ("the quick brown fox", None),
    ("The quick BROWN fox jumps over the lazy dog!", None),
    ("jumping jumped unaffable", None),
    ("hello, world.", "the quick fox?"),
    ("quantization model", "unknownword here"),
    ("  spaced   out\ttokens \n", None),
    ("", None),
]


@pytest.mark.parametrize("a,b", CASES)
def test_matches_hf_bert_tokenizer(wp, vocab_path, a, b):
    hf = hf_tok(vocab_path)
    enc = hf(a, b, truncation=True, max_length=16, padding="max_length")
    ids, types, mask = wp.encode_pair(a, b, 16)
    assert ids == enc["input_ids"], (a, b, ids, enc["input_ids"])
    assert mask == enc["attention_mask"]
    assert types == enc.get("token_type_ids", types)


def test_truncation_longest_first(wp, vocab_path):
    hf = hf_tok(vocab_path)
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = "hello world"
    enc = hf(a, b, truncation=True, max_length=12, padding="max_length")
    ids, types, mask = wp.encode_pair(a, b, 12)
    assert ids == enc["input_ids"]


def test_batch_encode(wp):
    pairs = [("the quick fox", None), ("hello world", "lazy dog")]
    ids, types, mask = wp.encode_batch(pairs, 16)
    assert ids.shape == (2, 16)
    i0, t0, m0 = wp.encode_pair("the quick fox", None, 16)
    np.testing.assert_array_equal(ids[0], i0)
    i1, t1, m1 = wp.encode_pair("hello world", "lazy dog", 16)
    np.testing.assert_array_equal(ids[1], i1)
    np.testing.assert_array_equal(types[1], t1)


def test_accent_and_unicode(wp, vocab_path):
    hf = hf_tok(vocab_path)
    for text in ["é the", "naïve fox", "“the” dog"]:
        enc = hf(text, truncation=True, max_length=16, padding="max_length")
        ids, _, _ = wp.encode_pair(text, None, 16)
        assert ids == enc["input_ids"], text
