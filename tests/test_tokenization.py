"""Tokenizer parity vs transformers.BertTokenizer (slow python impl, no
network needed — constructed from a local vocab file)."""
import numpy as np
import pytest

from xlxmert_tpu.data.tokenization import Tokenizer

transformers = pytest.importorskip("transformers")

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "the", "man", "dog", "##s", "run", "##ning", "play", "##ing",
    "in", "park", "!", ",", ".", "un", "##aff", "##able", "with",
    "red", "ball", "##oon", "cafe", "2", "##0",
]

SENTENCES = [
    "A man running in the park!",
    "the dogs playing with a red balloon",
    "unaffable, unknown WORDS here.",
    "CAFÉ café 20 dogs!!!",
    "",
    "the " * 40,  # long input, truncation
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    ours = Tokenizer(str(p))
    theirs = transformers.BertTokenizer(str(p), do_lower_case=True)
    return ours, theirs


@pytest.mark.parametrize("idx", range(len(SENTENCES)))
def test_tokenize_parity(pair, idx):
    ours, theirs = pair
    s = SENTENCES[idx]
    assert ours.tokenize(s) == theirs.tokenize(s)


@pytest.mark.parametrize("idx", range(len(SENTENCES)))
def test_encode_parity(pair, idx):
    ours, theirs = pair
    s = SENTENCES[idx]
    ref = theirs(s, max_length=20, truncation=True)["input_ids"]
    assert ours.encode(s, max_length=20) == ref


def test_encode_batch_static_shape(pair):
    ours, _ = pair
    mat = ours.encode_batch(SENTENCES, max_length=20)
    assert mat.shape == (len(SENTENCES), 20)
    assert mat.dtype == np.int32
    assert (mat[:, 0] == ours.cls_id).all()
    # padded rows end in PAD
    assert mat[4, 3] == ours.pad_id  # empty sentence: CLS SEP PAD...


def test_decode_roundtrip(pair):
    ours, _ = pair
    ids = ours.encode("the man running", max_length=20)
    assert ours.decode(ids[1:-1]) == "the man running"
