"""ctypes binding for the native C++ loader/stats (loader.cpp).

Compiled lazily with g++ on first import (no pybind11 in the image; the
C ABI + ctypes keeps the binding dependency-free).  Every consumer must
treat ImportError / None as "fall back to the NumPy path" — the native
layer is a prep-phase accelerator, never a correctness dependency.

Disable with S18_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "_s18native.so")


class _S18Relation(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("num_tuples", ctypes.c_uint64),
        ("num_cols", ctypes.c_uint64),
        ("map_base", ctypes.c_void_p),
        ("map_len", ctypes.c_uint64),
    ]


def _build() -> Optional[ctypes.CDLL]:
    if os.environ.get("S18_NATIVE", "1") == "0":
        return None
    # The .so is never committed (it would be unreviewable and could carry
    # another host's microarchitecture); it is built from source on first
    # import.  No -march=native: the binary may outlive the host it was
    # built on (container snapshots), and the hot loops vectorize fine at
    # plain -O3.
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", _SO + ".tmp", _SRC, "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_SO + ".tmp", _SO)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.s18_load.argtypes = [ctypes.c_char_p, ctypes.POINTER(_S18Relation)]
    lib.s18_load.restype = ctypes.c_int
    lib.s18_unload.argtypes = [ctypes.POINTER(_S18Relation)]
    lib.s18_unload.restype = None
    lib.s18_stats.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
    ]
    lib.s18_stats.restype = None
    return lib if _selftest(lib) else None


def _selftest(lib) -> bool:
    """Run-once smoke test: load + stat a tiny relation in-process.  A bad
    binary (stale build, ABI drift) fails here and the NumPy path takes
    over, instead of SIGILL/SIGSEGV mid-serving."""
    try:
        data = np.array([2, 2, 5, 7, 5, 9], dtype=np.uint64)  # 2 cols x 2 rows
        with tempfile.NamedTemporaryFile(suffix=".s18", delete=False) as f:
            f.write(np.array([2, 2], dtype=np.uint64).tobytes())
            f.write(data[2:].tobytes())
            path = f.name
        try:
            rel = _S18Relation()
            if lib.s18_load(path.encode(), ctypes.byref(rel)) != 0:
                return False
            raw = (ctypes.c_uint64 * 12)()
            lib.s18_stats(rel.data, 2, 2, raw, 1)
            ok = (raw[0], raw[1], raw[2], raw[3]) == (5, 7, 2, 2)
            lib.s18_unload(ctypes.byref(rel))
            return ok
        finally:
            os.unlink(path)
    except Exception:
        return False


_LIB = _build()


def load_relations_native(paths: Sequence[str], threads: int = 0):
    """Load + stat relations with the native layer.

    Returns a list of (Relation, [ColumnStats]) or None if the native
    library is unavailable (caller falls back to NumPy).
    """
    if _LIB is None:
        return None
    from ..catalog import ColumnStats
    from ..relation import Relation

    threads = threads or (os.cpu_count() or 4)
    out = []
    for path in paths:
        rel = _S18Relation()
        rc = _LIB.s18_load(os.fspath(path).encode(), ctypes.byref(rel))
        if rc != 0:
            raise ValueError(f"{path}: native load failed ({rc})")
        t, c = int(rel.num_tuples), int(rel.num_cols)
        if t == 0 or c == 0:
            cols = [np.empty(0, dtype=np.uint64) for _ in range(c)]
            stats = [ColumnStats(0, 0, 0, 0) for _ in range(c)]
            _LIB.s18_unload(ctypes.byref(rel))
            out.append((Relation(cols, name=os.path.basename(path)), stats))
            continue
        # Zero-copy view of the mapping; the mapping stays alive for the
        # process lifetime (relations are immutable; the reference also
        # never munmaps during serving, relation_map.c:90-98).
        buf = (ctypes.c_uint64 * (t * c)).from_address(rel.data)
        arr = np.frombuffer(buf, dtype=np.uint64).reshape(c, t)
        raw = (ctypes.c_uint64 * (6 * c))()
        _LIB.s18_stats(rel.data, t, c, raw, threads)
        stats = [
            ColumnStats(int(raw[6 * i]), int(raw[6 * i + 1]),
                        int(raw[6 * i + 2]), int(raw[6 * i + 3]),
                        int(raw[6 * i + 4]), int(raw[6 * i + 5]))
            for i in range(c)
        ]
        out.append((Relation([arr[i] for i in range(c)],
                             name=os.path.basename(path)), stats))
    return out
