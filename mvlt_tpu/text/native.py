"""ctypes bindings for the native C++ tokenizer (csrc/tokenizer.cc).

The shared library is built with ``make -C csrc`` into
``mvlt_tpu/_native/libmvlt_native.so``.  :class:`NativeWordPiece` is a
drop-in fast path for ``WordPieceTokenizer.encode`` on ASCII text; the
wrapper transparently falls back to pure Python for non-ASCII input or
when the library is absent, so behavior is always parity-exact.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "_native", "libmvlt_native.so")


def load_library(path: str = _LIB_PATH) -> Optional[ctypes.CDLL]:
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.mvlt_tokenizer_create.restype = ctypes.c_void_p
    lib.mvlt_tokenizer_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mvlt_tokenizer_add_token.restype = ctypes.c_int
    lib.mvlt_tokenizer_add_token.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mvlt_tokenizer_vocab_size.restype = ctypes.c_int
    lib.mvlt_tokenizer_vocab_size.argtypes = [ctypes.c_void_p]
    lib.mvlt_tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.mvlt_tokenizer_encode.restype = ctypes.c_int
    lib.mvlt_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.mvlt_ptb_tokenize.restype = ctypes.c_int
    lib.mvlt_ptb_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_int]
    return lib


_PTB_LIB = None
_PTB_PROBES_LEFT = 3


def ptb_tokenize_native(text: str) -> Optional[str]:
    """Native PTB tokenization (csrc/ptb.cc); None if unavailable or the
    input is non-ASCII (caller falls back to the Python port)."""
    global _PTB_LIB, _PTB_PROBES_LEFT
    if not _PTB_LIB:
        # Bounded re-probing: the library may be built shortly after the
        # first (failed) lookup, but when it is genuinely absent a
        # per-call dlopen/stat in tokenization loops is pure overhead.
        if _PTB_PROBES_LEFT <= 0:
            return None
        _PTB_PROBES_LEFT -= 1
        _PTB_LIB = load_library()
        if _PTB_LIB is None:
            return None
        _PTB_PROBES_LEFT = 3
    if not text.isascii():
        return None
    # worst case ~7x: every '(' expands to ' -LRB- '
    buf = ctypes.create_string_buffer(max(4096, len(text) * 8 + 16))
    n = _PTB_LIB.mvlt_ptb_tokenize(text.encode(), buf, len(buf))
    if n < 0:
        return None
    return buf.value.decode()


class NativeWordPiece:
    def __init__(self, vocab_path: str, do_lower_case: bool = True,
                 eos_token: str = "[END]",
                 lib: Optional[ctypes.CDLL] = None):
        self.lib = lib if lib is not None else load_library()
        if self.lib is None:
            raise FileNotFoundError(
                f"native tokenizer library not built ({_LIB_PATH}); "
                "run `make -C csrc`")
        self.handle = self.lib.mvlt_tokenizer_create(
            vocab_path.encode(), int(do_lower_case))
        if not self.handle:
            raise FileNotFoundError(vocab_path)
        self.lib.mvlt_tokenizer_add_token(self.handle, eos_token.encode())
        self._buf = (ctypes.c_int * 4096)()

    def __del__(self):
        if getattr(self, "handle", None) and getattr(self, "lib", None):
            self.lib.mvlt_tokenizer_destroy(self.handle)
            self.handle = None

    def vocab_size(self) -> int:
        return self.lib.mvlt_tokenizer_vocab_size(self.handle)

    def encode(self, text: str) -> List[int]:
        n = self.lib.mvlt_tokenizer_encode(
            self.handle, text.encode(), self._buf, len(self._buf))
        if n < 0:
            raise ValueError("text too long for native buffer")
        return list(self._buf[:n])


def is_ascii(text: str) -> bool:
    return text.isascii()
