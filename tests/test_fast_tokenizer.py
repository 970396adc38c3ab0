"""Native tokenizer parity vs the (HF-verified) Python implementation."""
import time

import numpy as np
import pytest

from xlxmert_tpu.data.fast_tokenizer import FastTokenizer
from xlxmert_tpu.data.tokenization import Tokenizer

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
    "CAFE cafe 20 dogs!!!",
    "",
    "the " * 40,
    "CAFÉ café 20 dogs",  # non-ASCII -> python fallback row
]


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    fast = FastTokenizer(str(p))
    py = Tokenizer(str(p))
    return fast, py


def test_native_built(toks):
    fast, _ = toks
    assert fast.native, "native tokenizer failed to build (g++ available?)"


def test_batch_parity(toks):
    fast, py = toks
    ours = fast.encode_batch(SENTENCES, 20)
    ref = py.encode_batch(SENTENCES, 20)
    np.testing.assert_array_equal(ours, ref)


def test_large_batch_parity_and_speed(toks):
    fast, py = toks
    base = ["a man running in the park with a red balloon ! " * 3] * 4096
    t0 = time.time()
    ours = fast.encode_batch(base, 20)
    t_fast = time.time() - t0
    t0 = time.time()
    ref = py.encode_batch(base, 20)
    t_py = time.time() - t0
    np.testing.assert_array_equal(ours, ref)
    # the native path must actually be faster on big batches
    assert t_fast < t_py, (t_fast, t_py)
