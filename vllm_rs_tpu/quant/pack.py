"""Canonical quantized weight format + quantize/dequantize references.

A quantized linear weight of logical shape [K, N] (y = x @ W) is stored as:
    qweight: [K, N]      int8 or int4 (jnp.int4 — XLA packs two per byte)
    scales:  [K//G, N]   float32 (bf16-castable), G = group size along K
    zeros:   [K//G, N]   float32 or None (asymmetric int4 only)
dequant:  W[k, n] = (qweight[k, n] - zeros[k//G, n]) * scales[k//G, n]
(zeros treated as 0 when None).

Grouping along K (the reduction dim) matches GPTQ/AWQ/GGUF-K-quant
conventions, so all checkpoint formats fold into this layout losslessly at
their native group sizes. The Pallas matmul kernel (ops/pallas/quant_matmul)
dequantizes tiles in-register as it streams qweight from HBM — the int4
weight stream is the bandwidth the roofline is paid in.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTensor(NamedTuple):
    qweight: jax.Array  # [K, N] int8 / int4
    scales: jax.Array  # [K//G, N]
    zeros: Optional[jax.Array] = None  # [K//G, N] or None

    @property
    def group_size(self) -> int:
        return self.qweight.shape[0] // self.scales.shape[0]

    @property
    def shape(self):
        return self.qweight.shape


def quantize_int8(w: jax.Array, group: int = 128) -> QuantizedTensor:
    """Symmetric per-group int8. w: [K, N] float."""
    K, N = w.shape
    assert K % group == 0, (K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [K//G, N]
    scales = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / scales[:, None, :]), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q.reshape(K, N), scales, None)


def quantize_int4(w: jax.Array, group: int = 128, symmetric: bool = False) -> QuantizedTensor:
    """Per-group int4; asymmetric by default (min/max range like Q4_K)."""
    K, N = w.shape
    assert K % group == 0, (K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    if symmetric:
        amax = jnp.max(jnp.abs(wf), axis=1)
        scales = jnp.maximum(amax / 7.0, 1e-10)
        q = jnp.clip(jnp.round(wf / scales[:, None, :]), -8, 7)
        zeros = None
    else:
        wmin = jnp.min(wf, axis=1)
        wmax = jnp.max(wf, axis=1)
        scales = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
        zeros = jnp.round(-wmin / scales) - 8.0  # center into int4 range
        q = jnp.clip(jnp.round(wf / scales[:, None, :] + zeros[:, None, :]), -8, 7)
    return QuantizedTensor(
        q.astype(jnp.int4).reshape(K, N),
        scales,
        zeros.astype(jnp.float32) if zeros is not None else None,
    )


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequant (materializes the full weight — tests/fallback only)."""
    K, N = qt.qweight.shape
    G = qt.group_size
    q = qt.qweight.astype(jnp.float32).reshape(K // G, G, N)
    if qt.zeros is not None:
        q = q - qt.zeros[:, None, :]
    w = q * qt.scales[:, None, :]
    return w.reshape(K, N).astype(dtype)


def quantize_param(w: jax.Array, method: str, group: int = 128) -> QuantizedTensor:
    if method == "int8":
        return quantize_int8(w, group)
    if method == "int4":
        return quantize_int4(w, group)
    raise ValueError(f"unknown quant method {method!r}")
