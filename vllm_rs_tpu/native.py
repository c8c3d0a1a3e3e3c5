"""Native (C++) runtime components: build-on-demand + ctypes bindings.

Counterpart of the reference's native crates (attention-rs's host-side
pieces + candle's GGUF decode): csrc/gguf_dequant.cpp holds the GGML block
dequantizers and the prefix-cache chain hash. The shared library is
compiled once with g++ into a per-repo cache and loaded via ctypes; every
entry point has a pure-Python fallback (utils/gguf.py, core/prefix_cache.py)
so the engine works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
# repo checkout keeps csrc/ at the root; built wheels ship a copy inside
# the package (scripts/build_wheel.sh)
_CSRC_CANDIDATES = (
    os.path.join(os.path.dirname(_PKG_DIR), "csrc"),
    os.path.join(_PKG_DIR, "csrc"),
)
_CSRC = next(
    (d for d in _CSRC_CANDIDATES if os.path.isdir(d)), _CSRC_CANDIDATES[0]
)
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get(
        "VLLM_RS_TPU_NATIVE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native_cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load the native library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_CSRC, "gguf_dequant.cpp")
        if not os.path.exists(src):
            return None
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"libvllm_native_{digest}.so")
        if not os.path.exists(so):
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
                src, "-o", so,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                logger.info("built native library: %s", so)
            except Exception as e:  # pragma: no cover — no toolchain
                logger.warning("native build failed (%s); using Python fallbacks", e)
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:  # pragma: no cover
            logger.warning("native load failed (%s)", e)
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        for name in (
            "dequant_q8_0", "dequant_q4_0", "dequant_q4_1", "dequant_q5_0",
            "dequant_q5_1", "dequant_q4_k", "dequant_q5_k", "dequant_q6_k",
            "dequant_q2_k", "dequant_q3_k", "dequant_f16", "dequant_bf16",
        ):
            fn = getattr(lib, name)
            fn.argtypes = [u8, f32, ctypes.c_int64]
            fn.restype = None
        lib.hash_token_blocks.argtypes = [
            i32, ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64, u64,
        ]
        lib.hash_token_blocks.restype = None
        _LIB = lib
        return _LIB


# GGML dtype id → (native fn name, block values, block bytes)
_NATIVE_DEQUANT = {
    0: ("dequant_f32", 1, 4),  # handled by view, listed for completeness
    1: ("dequant_f16", 1, 2),
    2: ("dequant_q4_0", 32, 18),
    3: ("dequant_q4_1", 32, 20),
    6: ("dequant_q5_0", 32, 22),
    7: ("dequant_q5_1", 32, 24),
    8: ("dequant_q8_0", 32, 34),
    10: ("dequant_q2_k", 256, 84),
    11: ("dequant_q3_k", 256, 110),
    12: ("dequant_q4_k", 256, 144),
    13: ("dequant_q5_k", 256, 176),
    14: ("dequant_q6_k", 256, 210),
    30: ("dequant_bf16", 1, 2),
}


def native_dequantize_ggml(raw: np.ndarray, dtype: int) -> Optional[np.ndarray]:
    """Native GGML dequant; None when unavailable (caller falls back)."""
    lib = load_native()
    if lib is None or dtype not in _NATIVE_DEQUANT or dtype == 0:
        return None
    name, bk, bb = _NATIVE_DEQUANT[dtype]
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    if dtype in (1, 30):  # f16 / bf16: count = elements
        n = raw.size // 2
        out = np.empty(n, dtype=np.float32)
        getattr(lib, name)(raw, out, n)
        return out
    n_blocks = raw.size // bb
    out = np.empty(n_blocks * bk, dtype=np.float32)
    getattr(lib, name)(raw, out, n_blocks)
    return out


def native_hash_blocks(
    tokens: np.ndarray, block_size: int, seed: int = 0
) -> Optional[np.ndarray]:
    """Chained per-block FNV-1a hashes; None when native lib unavailable."""
    lib = load_native()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    n_blocks = tokens.size // block_size
    out = np.empty(n_blocks, dtype=np.uint64)
    lib.hash_token_blocks(tokens, tokens.size, block_size, seed, out)
    return out
