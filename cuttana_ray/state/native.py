"""Build-and-load shim for the native sequential core (``_native.c``).

The Cuttana stream pass is one sequential task by construction
(``/root/reference/src/cuttana.rs:30-46``); it is the engine's Amdahl term,
constant across cluster sizes. This module compiles ``_native.c`` with the
system C compiler at first use (cached by source hash under ``/tmp``) and
exposes it through ctypes. If no compiler is available, callers fall back to
the pure-Python path in ``partitioner.py`` — same results, slower.

Parity: the kernel is a bit-identical port of the Python path (see the
header comment in ``_native.c`` for the float-determinism preconditions);
``tests/test_native_parity.py`` asserts identical assignments on a spread of
graphs, configs and stream layouts. ``-ffp-contract=off`` is load-bearing:
FMA contraction would change the last bit of FENNEL scores and with it
tie-break draws.

Set ``CUTTANA_NATIVE=0`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")
_lib = None
_lib_tried = False

_CFLAGS = ["-O2", "-std=c11", "-ffp-contract=off", "-fPIC", "-shared"]


def _build() -> "ctypes.CDLL | None":
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src + b"\0".join(f.encode() for f in _CFLAGS)).hexdigest()[:16]
    cache_dir = os.environ.get("CUTTANA_NATIVE_CACHE", tempfile.gettempdir())
    so_path = os.path.join(cache_dir, f"cuttana_native_{tag}.so")
    if not os.path.exists(so_path):
        for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
            if not cc:
                continue
            tmp = so_path + f".build{os.getpid()}"
            try:
                subprocess.run([cc, *_CFLAGS, "-o", tmp, _SRC, "-lm"],
                               check=True, capture_output=True, timeout=120)
                os.replace(tmp, so_path)  # atomic: concurrent builds converge
                break
            except (OSError, subprocess.SubprocessError):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                continue
        else:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64, u64, dbl, ptr = (ctypes.c_int64, ctypes.c_uint64, ctypes.c_double,
                          ctypes.c_void_p)
    p64 = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    lib.ctn_create.argtypes = [i64, i64, i64, dbl, dbl, dbl, dbl, dbl,
                               i64, i64, i64, i64, u64]
    lib.ctn_create.restype = ptr
    lib.ctn_consume.argtypes = [ptr, i64, p64, p64, p64]
    lib.ctn_consume.restype = ctypes.c_int
    lib.ctn_finalize.argtypes = [ptr]
    lib.ctn_finalize.restype = ctypes.c_int
    lib.ctn_get_assign.argtypes = [ptr, p64, p64]
    lib.ctn_get_assign.restype = None
    lib.ctn_get_sub_parent.argtypes = [ptr, p64]
    lib.ctn_get_sub_parent.restype = None
    for name in ("ctn_vertex_count", "ctn_edge_count", "ctn_cut_count",
                 "ctn_refine_moves"):
        fn = getattr(lib, name)
        fn.argtypes = [ptr]
        fn.restype = i64
    lib.ctn_destroy.argtypes = [ptr]
    lib.ctn_destroy.restype = None
    return lib


def get_lib() -> "ctypes.CDLL | None":
    """The compiled kernel, or None if disabled/unbuildable (cached)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("CUTTANA_NATIVE", "1") == "0":
        return None
    _lib = _build()
    return _lib


class NativeCore:
    """ctypes handle wrapper mirroring StreamingPartitioner's inner loop."""

    def __init__(self, lib, num_vertices: int, num_partitions: int, config,
                 slack_widened: float) -> None:
        self._lib = lib
        self.num_vertices = num_vertices
        self.num_partitions = num_partitions
        self.total_subs = num_partitions * config.num_sub_partitions
        self._h = lib.ctn_create(
            num_vertices, num_partitions, config.num_sub_partitions,
            slack_widened, config.balance_slack, config.gamma,
            config.sub_gamma, config.theta, config.buffer_degree_threshold,
            config.max_buffer_size, config.info_gain_threshold,
            config.max_refine_moves, config.seed & ((1 << 64) - 1))
        if not self._h:
            raise MemoryError("native core allocation failed")

    def consume_batch(self, vertices: np.ndarray, offsets: np.ndarray,
                      flat_nbrs: np.ndarray) -> None:
        v = np.ascontiguousarray(vertices, dtype=np.int64)
        o = np.ascontiguousarray(offsets, dtype=np.int64)
        f = np.ascontiguousarray(flat_nbrs, dtype=np.int64)
        if f.size == 0:
            f = np.zeros(1, dtype=np.int64)  # valid base pointer
        rc = self._lib.ctn_consume(self._h, len(v), v, o, f)
        self._check(rc)

    def finalize(self) -> dict:
        rc = self._lib.ctn_finalize(self._h)
        self._check(rc)
        part = np.empty(self.num_vertices, dtype=np.int64)
        sub = np.empty(self.num_vertices, dtype=np.int64)
        self._lib.ctn_get_assign(self._h, part, sub)
        parent = np.empty(self.total_subs, dtype=np.int64)
        self._lib.ctn_get_sub_parent(self._h, parent)
        out = {
            "part_of": part,
            "sub_of": sub,
            "sub_parent": parent,
            "vertex_count": int(self._lib.ctn_vertex_count(self._h)),
            "edge_count": int(self._lib.ctn_edge_count(self._h)),
            "cut_count": int(self._lib.ctn_cut_count(self._h)),
            "refine_moves": int(self._lib.ctn_refine_moves(self._h)),
        }
        return out

    def _check(self, rc: int) -> None:
        if rc == 0:
            return
        from cuttana_ray.state.core import CapacityError
        if rc == 1:
            raise CapacityError(
                "Partition capacity exceeded. Increase balance_slack or "
                "num_partitions.")
        if rc == 3:
            raise RuntimeError("finalize() called twice")
        raise MemoryError(f"native core error {rc}")

    def close(self) -> None:
        if self._h:
            self._lib.ctn_destroy(self._h)
            self._h = None

    def __del__(self) -> None:  # best-effort; close() is called explicitly
        try:
            self.close()
        except Exception:
            pass
