"""ctypes loader for the native C++ components (graceful fallback).

The native library is built with ``make -C legal_rag_tpu/native``; if
the .so is absent (or the platform lacks a toolchain) every caller
transparently uses the pure-Python implementations — native code is an
accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwordpiece.so"

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def build_native(force: bool = False) -> bool:
    """Compile the native library in-tree; True on success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists() and not build_native():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int32
    lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


class NativeWordPiece:
    """C++ WordPiece encoder with the Python tokenizer's contract."""

    def __init__(self, vocab: Dict[str, int]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native wordpiece library unavailable")
        self._lib = lib
        self.vocab = vocab
        inv = {i: t for t, i in vocab.items()}
        tokens = [inv[i].encode("utf-8") for i in range(len(inv))]
        arr = (ctypes.c_char_p * len(tokens))(*tokens)
        from legal_rag_tpu.models.wordpiece import PAD, UNK, CLS, SEP

        self.pad_id = vocab[PAD]
        self._handle = lib.wp_create(
            arr, len(tokens),
            vocab[UNK], vocab[CLS], vocab[SEP], vocab[PAD],
        )
        self._buf = np.empty(4096, dtype=np.int32)

    def __del__(self):  # noqa: D105
        handle = getattr(self, "_handle", None)
        if handle and self._lib:
            self._lib.wp_destroy(handle)
            self._handle = None

    def encode(
        self, text: str, max_len: int = 256, add_special: bool = True
    ) -> List[int]:
        data = text.encode("utf-8")
        n = self._lib.wp_encode(
            self._handle, data, len(data),
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._buf), int(add_special), max_len,
        )
        return self._buf[:n].tolist()

    def encode_batch(self, texts: Sequence[str], max_len: int = 256):
        """Same bucketing contract as WordPieceTokenizer.encode_batch
        (shared helper — shapes must never diverge between paths)."""
        from legal_rag_tpu.models.wordpiece import pad_and_bucket

        encoded = [self.encode(t, max_len=max_len) for t in texts]
        return pad_and_bucket(encoded, max_len, self.pad_id)


def native_available() -> bool:
    return _load() is not None
