"""Native (C++) component loader.

Where the reference leans on PyTorch/HF's native cores for everything
below Python (SURVEY.md §2.6 — it ships no native code of its own), this
framework carries its own C++ pieces under ``native/`` and builds them
on demand with the system toolchain (g++; no pybind11 in this image, so
the ABI is plain C consumed via ctypes). Build products are cached next
to the sources and rebuilt when the source hash changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")


def _build(src_name: str, lib_name: str) -> Optional[str]:
    src = os.path.join(NATIVE_DIR, src_name)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(BUILD_DIR, f"{lib_name}.{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None
    return out


_WP_LIB = None
_WP_TRIED = False


def _wordpiece_lib():
    global _WP_LIB, _WP_TRIED
    if _WP_TRIED:
        return _WP_LIB
    _WP_TRIED = True
    path = _build("wordpiece.cpp", "libwordpiece")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_encode_pair.restype = ctypes.c_int
    lib.wp_encode_pair.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.wp_encode_batch.restype = ctypes.c_int
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    _WP_LIB = lib
    return lib


def wordpiece_available() -> bool:
    return _wordpiece_lib() is not None


class WordPieceTokenizer:
    """Native WordPiece tokenizer over a BERT ``vocab.txt``.

    Drop-in for the data pipeline's ``encode_pair`` contract
    (utils/data.py) and the serving engine's tokenizer slot.
    """

    def __init__(self, vocab_path: str, lowercase: bool = True):
        lib = _wordpiece_lib()
        if lib is None:
            raise RuntimeError("native wordpiece library unavailable "
                               "(g++ build failed?)")
        self._lib = lib
        self._h = lib.wp_load(vocab_path.encode(), int(lowercase))
        if not self._h:
            raise FileNotFoundError(vocab_path)
        self.vocab_size = lib.wp_vocab_size(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.wp_free(h)
            self._h = None

    def encode_pair(self, a: str, b: Optional[str], max_len: int):
        ids = np.zeros(max_len, np.int32)
        types = np.zeros(max_len, np.int32)
        mask = np.zeros(max_len, np.int32)
        self._lib.wp_encode_pair(
            self._h, a.encode(), b.encode() if b else None, max_len,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return ids.tolist(), types.tolist(), mask.tolist()

    def encode_batch(self, pairs, max_len: int):
        """Batch-encode [(a, b|None), ...] in one native call."""
        n = len(pairs)
        packed = "\x1e".join(
            a + ("\x1f" + b if b else "") for a, b in pairs).encode()
        ids = np.zeros((n, max_len), np.int32)
        types = np.zeros((n, max_len), np.int32)
        mask = np.zeros((n, max_len), np.int32)
        self._lib.wp_encode_batch(
            self._h, packed, n, max_len,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return ids, types, mask
