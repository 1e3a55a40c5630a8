"""Native (C++) host-side graph-builder runtime, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this module accelerates the host
side of graph construction — COO→BSR tiling, label-propagation community
ordering, banded all-pairs DTW — which the numpy fallbacks in
``ops/bsr.py`` / ``models/stgode.py`` implement identically (the reference
does all of this in Python: adjacency assembly at
/root/reference/libcity/data/dataset/traffic_state_datatset.py:236-299,
there at dense N x N scale).

Build model: ``graphtools.cpp`` is compiled on first use with g++ into a
shared library cached under ``~/.cache/multistgraph_tpu`` keyed by a hash
of the source, and bound with ctypes (no pybind11 dependency). Everything
degrades gracefully: if g++ is missing, the compile fails, or
``MSG_NATIVE=0`` is set, ``lib()`` returns None and callers keep their
numpy paths. Numerical contract: bit-identical results to the numpy
implementations (same accumulation order, tie-breaking, sort stability) —
asserted by tests/test_native.py.
"""

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "graphtools.cpp")
_CACHE_ROOT = os.environ.get(
    "MSG_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "multistgraph_tpu"),
)

_lock = threading.Lock()
_lib = None
_load_attempted = False
_load_error = None


def _compile(src_path: str, out_path: str) -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-funroll-loops", src_path, "-o", out_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.msg_bsr_plan.restype = ctypes.c_void_p
    lib.msg_bsr_plan.argtypes = [p_i64, p_i64, i64, i64, i64, i64]
    lib.msg_bsr_nnz.restype = i64
    lib.msg_bsr_nnz.argtypes = [ctypes.c_void_p]
    lib.msg_bsr_tiles.restype = None
    lib.msg_bsr_tiles.argtypes = [ctypes.c_void_p, p_i32, p_i32]
    lib.msg_bsr_fill.restype = None
    lib.msg_bsr_fill.argtypes = [ctypes.c_void_p, p_f32, p_f32, i64]
    lib.msg_bsr_free.restype = None
    lib.msg_bsr_free.argtypes = [ctypes.c_void_p]

    lib.msg_community_order.restype = None
    lib.msg_community_order.argtypes = [p_i64, p_i64, i64, i64, i64, p_i64, i64]

    lib.msg_dtw_band.restype = None
    lib.msg_dtw_band.argtypes = [p_f32, i64, i64, i64, p_f32, i64]
    return lib


def lib():
    """The bound native library, or None when unavailable/disabled."""
    global _lib, _load_attempted, _load_error
    if os.environ.get("MSG_NATIVE", "1") in ("0", "false", "off"):
        return None
    with _lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(_CACHE_ROOT, "graphtools-{}.so".format(digest))
            if not os.path.exists(so_path):
                os.makedirs(_CACHE_ROOT, exist_ok=True)
                # Compile to a temp name then atomically rename so concurrent
                # processes (pytest-xdist workers) never load a half-written .so.
                fd, tmp = tempfile.mkstemp(
                    dir=_CACHE_ROOT, suffix=".so.build")
                os.close(fd)
                try:
                    _compile(_SRC, tmp)
                    os.replace(tmp, so_path)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            _lib = _bind(ctypes.CDLL(so_path))
        except Exception as exc:  # missing g++, compile error, bad platform
            _load_error = exc
            _lib = None
            print(
                "multistgraph_tpu.native: falling back to numpy ({})".format(exc),
                file=sys.stderr,
            )
        return _lib


def available() -> bool:
    return lib() is not None


def load_error():
    """The exception that disabled the native path, if any (diagnostics)."""
    lib()
    return _load_error


class BsrPlan:
    """Edge-structure plan for BSR assembly (sort/unique paid once).

    Multi-view graphs that share one edge set (OD / distance / semantic
    weights over identical links) reuse the plan and only re-run the cheap
    ``fill`` per view.
    """

    def __init__(self, src, dst, num_nodes: int, block: int, nthreads: int = 0):
        native = lib()
        if native is None:
            raise RuntimeError("native library unavailable; use the numpy path")
        if not 0 < block <= 256:
            raise ValueError("native BSR plan supports block sizes up to 256")
        self._lib = native
        src = np.ascontiguousarray(src, np.int64)
        dst = np.ascontiguousarray(dst, np.int64)
        self.num_edges = len(src)
        self.num_nodes = int(num_nodes)
        self.block = int(block)
        self._handle = native.msg_bsr_plan(
            src, dst, self.num_edges, self.num_nodes, self.block,
            int(nthreads),
        )
        self.nnz_blocks = int(native.msg_bsr_nnz(self._handle))
        self.row_of = np.empty(self.nnz_blocks, np.int32)
        self.col_of = np.empty(self.nnz_blocks, np.int32)
        native.msg_bsr_tiles(self._handle, self.row_of, self.col_of)

    def fill(self, weights, nthreads: int = 0) -> np.ndarray:
        """Accumulate edge weights into a fresh (nnz, block, block) tensor."""
        w = np.ascontiguousarray(weights, np.float32)
        if len(w) != self.num_edges:
            raise ValueError("weights length != num_edges")
        values = np.zeros((self.nnz_blocks, self.block, self.block), np.float32)
        self._lib.msg_bsr_fill(self._handle, w, values, int(nthreads))
        return values

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.msg_bsr_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def community_order_native(src, dst, num_nodes: int, rounds: int = 10,
                           nthreads: int = 0) -> np.ndarray:
    native = lib()
    if native is None:
        raise RuntimeError("native library unavailable; use the numpy path")
    s = np.ascontiguousarray(src, np.int64)
    d = np.ascontiguousarray(dst, np.int64)
    perm = np.empty(num_nodes, np.int64)
    native.msg_community_order(s, d, len(s), int(num_nodes), int(rounds),
                               perm, int(nthreads))
    return perm


def dtw_band_native(profiles, band: int = 4, nthreads: int = 0) -> np.ndarray:
    native = lib()
    if native is None:
        raise RuntimeError("native library unavailable; use the numpy path")
    p = np.ascontiguousarray(profiles, np.float32)
    n, plen = p.shape
    out = np.empty((n, n), np.float32)
    native.msg_dtw_band(p, n, plen, int(band), out, int(nthreads))
    return out
