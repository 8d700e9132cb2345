"""In-process compiled-Snowball oracle (development-time only).

DuckDB's python wheel statically links the Snowball stemmer family and
exports the generated entry points (``<lang>_UTF_8_stem``) plus the tiny
runtime API (``SN_create_env`` / ``SN_set_current`` / ``SN_close_env``), so
the REAL compiled algorithms can be driven in-process via ctypes — a much
faster iteration oracle than the psql round-trip in snowball_oracle.py, and
an independent second build to cross-check against. Used only to verify our
pure-Python re-implementations; nothing at runtime or test time imports it.
"""

from __future__ import annotations

import ctypes
import glob

_SO = glob.glob(
    "/root/.pyenv/versions/3.11*/lib/python3.11/site-packages/duckdb/duckdb*.so"
)[0]
_lib = ctypes.CDLL(_SO)

_lib.SN_create_env.restype = ctypes.c_void_p
_lib.SN_set_current.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]


class _SNEnv(ctypes.Structure):
    _fields_ = [
        ("p", ctypes.POINTER(ctypes.c_ubyte)),
        ("c", ctypes.c_int), ("l", ctypes.c_int), ("lb", ctypes.c_int),
        ("bra", ctypes.c_int), ("ket", ctypes.c_int),
        ("S", ctypes.c_void_p), ("I", ctypes.c_void_p), ("B", ctypes.c_void_p),
    ]


class NativeStemmer:
    def __init__(self, language: str):
        create = getattr(_lib, f"{language}_UTF_8_create_env")
        create.restype = ctypes.c_void_p
        self._stem = getattr(_lib, f"{language}_UTF_8_stem")
        self._stem.argtypes = [ctypes.c_void_p]
        self._close = getattr(_lib, f"{language}_UTF_8_close_env")
        self._close.argtypes = [ctypes.c_void_p]
        self._env = create()

    def stem(self, word: str) -> str:
        data = word.encode("utf-8")
        _lib.SN_set_current(self._env, len(data), data)
        self._stem(self._env)
        env = ctypes.cast(self._env, ctypes.POINTER(_SNEnv)).contents
        return bytes(env.p[: env.l]).decode("utf-8")


if __name__ == "__main__":
    import sys

    st = NativeStemmer(sys.argv[1])
    for w in sys.argv[2:]:
        print(w, "->", st.stem(w))
