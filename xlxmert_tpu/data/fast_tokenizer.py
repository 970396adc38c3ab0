"""ctypes binding for the native WordPiece batch encoder
(runtime/tokenizer.cpp), compiled on demand with g++ and cached next to
the source. Non-ASCII strings fall back per-row to the Python tokenizer;
any build/load failure falls back entirely — behavior is identical either
way (tests/test_fast_tokenizer.py enforces parity).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from xlxmert_tpu.data.tokenization import Tokenizer

_RUNTIME_DIR = Path(__file__).resolve().parent.parent / "runtime"
_SRC = _RUNTIME_DIR / "tokenizer.cpp"
_SO = _RUNTIME_DIR / "libxlt_tokenizer.so"


def _build_lib() -> Optional[ctypes.CDLL]:
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
        lib.xlt_vocab_load.restype = ctypes.c_void_p
        lib.xlt_vocab_load.argtypes = [ctypes.c_char_p]
        lib.xlt_vocab_free.argtypes = [ctypes.c_void_p]
        lib.xlt_encode_batch.restype = ctypes.c_int
        lib.xlt_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8)]
        return lib
    except Exception:
        return None


class FastTokenizer:
    """Drop-in for data/tokenization.Tokenizer's encode_batch, backed by
    the native library when available."""

    def __init__(self, vocab_path: str, do_lower_case: bool = True):
        self.py = Tokenizer(vocab_path, do_lower_case)
        self._lib = _build_lib() if do_lower_case else None
        self._handle = None
        if self._lib is not None:
            h = self._lib.xlt_vocab_load(str(vocab_path).encode())
            if h:
                self._handle = ctypes.c_void_p(h)
            else:
                self._lib = None

    # delegate the scalar API to the Python implementation
    def __getattr__(self, name):
        return getattr(self.py, name)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def encode_batch(self, texts: List[str], max_length: int = 20) -> np.ndarray:
        if self._handle is None:
            return self.py.encode_batch(texts, max_length)
        n = len(texts)
        out = np.zeros((n, max_length), np.int32)
        ok = np.zeros((n,), np.uint8)
        c_texts = (ctypes.c_char_p * n)(
            *[t.encode("utf-8", "ignore") for t in texts])
        self._lib.xlt_encode_batch(
            self._handle, c_texts, n, max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        bad = np.where(ok == 0)[0]
        for i in bad:  # non-ASCII rows: full-Unicode Python path
            ids = self.py.encode(texts[i], max_length)
            row = np.full((max_length,), self.py.pad_id, np.int32)
            row[: len(ids)] = ids
            out[i] = row
        return out

    def __del__(self):
        try:
            if self._handle is not None:
                self._lib.xlt_vocab_free(self._handle)
        except Exception:
            pass
