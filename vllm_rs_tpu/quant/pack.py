"""Canonical quantized weight format + quantize/dequantize references.

A quantized linear weight of logical shape [K, N] (y = x @ W) is stored as:
  int8:  QuantizedTensor — qweight [K, N] int8, scales [K//G, N]
  int4:  PackedInt4Tensor — qweight [K//2, N] int8 holding two nibbles in
         *split-half* order: byte row i holds W[i] in the low nibble and
         W[i + K/2] in the high nibble. Unpacking is therefore a
         concatenate along K — no sublane interleave — and a matmul kernel
         can process the two halves as two plain dots against two slices
         of x. scales [K//G, N], zeros [K//G, N] (asymmetric) or None.
dequant:  W[k, n] = (q[k, n] - zeros[k//G, n]) * scales[k//G, n]
(zeros treated as 0 when None); G = group size along K (the reduction dim),
matching GPTQ/AWQ/GGUF-K-quant conventions so all checkpoint formats fold
into this layout losslessly at their native group sizes.

int4 is nibble-packed into int8 containers rather than jnp.int4 because
(a) the axon TPU runtime cannot pass int4 arrays across the jit ABI
boundary, and (b) the Pallas kernel wants int8 loads + shifts anyway. The
HBM byte count is identical. Sign extension uses (x << 4) >> 4 arithmetic
shifts. The Pallas matmul kernel (ops/pallas/quant_matmul) dequantizes
tiles in-register as it streams qweight from HBM — the packed weight
stream is the bandwidth the roofline is paid in.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTensor(NamedTuple):
    """int8 symmetric, group-wise scales."""

    qweight: jax.Array  # [K, N] int8
    scales: jax.Array  # [K//G, N]
    zeros: Optional[jax.Array] = None  # [K//G, N] or None

    @property
    def group_size(self) -> int:
        return self.qweight.shape[0] // self.scales.shape[0]

    @property
    def shape(self):
        return self.qweight.shape


class PackedInt4Tensor(NamedTuple):
    """int4, two weights per int8 byte along K."""

    qweight: jax.Array  # [K//2, N] int8 (packed nibbles)
    scales: jax.Array  # [K//G, N]
    zeros: Optional[jax.Array] = None  # [K//G, N] or None

    @property
    def group_size(self) -> int:
        return 2 * self.qweight.shape[0] // self.scales.shape[0]

    @property
    def shape(self):
        return (2 * self.qweight.shape[0], self.qweight.shape[1])


AnyQuantTensor = Union[QuantizedTensor, PackedInt4Tensor]


def pack_int4(q: jax.Array) -> jax.Array:
    """[K, N] int8 values in [-8, 7] → [K//2, N] split-half packed nibbles:
    byte i = (W[i + K/2] << 4) | (W[i] & 0xF)."""
    K, N = q.shape
    assert K % 2 == 0, K
    q = q.astype(jnp.int8)
    low = q[: K // 2] & 0xF
    high = q[K // 2 :] & 0xF
    return ((high << 4) | low).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[K//2, N] split-half packed → [K, N] int8, sign-extended."""
    low = (packed << 4) >> 4  # arithmetic shifts sign-extend the low nibble
    high = packed >> 4
    return jnp.concatenate([low, high], axis=0)


def quantize_int8(w: jax.Array, group: int = 128) -> QuantizedTensor:
    """Symmetric per-group int8. w: [K, N] float."""
    K, N = w.shape
    assert K % group == 0, (K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [K//G, N]
    scales = jnp.maximum(amax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / scales[:, None, :]), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q.reshape(K, N), scales, None)


def quantize_int4(
    w: jax.Array, group: int = 128, symmetric: bool = True
) -> PackedInt4Tensor:
    """Per-group int4; symmetric by default — the zero-point correction in
    the fused kernels costs ~40% extra VPU work (measured on v5e), and ISQ
    from bf16 loses little to symmetry. Checkpoint formats that carry zero
    points (GPTQ/AWQ asymmetric, Q4_K mins) keep them."""
    K, N = w.shape
    assert K % group == 0 and group % 2 == 0, (K, group)
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
    return PackedInt4Tensor(
        pack_int4(q.reshape(K, N).astype(jnp.int8)),
        scales,
        zeros.astype(jnp.float32) if zeros is not None else None,
    )


def dequantize(qt: AnyQuantTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Reference dequant (materializes the full weight — tests/fallback only)."""
    if isinstance(qt, PackedInt4Tensor):
        qw = unpack_int4(qt.qweight)
    else:
        qw = qt.qweight
    K, N = qw.shape
    G = qt.group_size
    q = qw.astype(jnp.float32).reshape(K // G, G, N)
    if qt.zeros is not None:
        q = q - qt.zeros[:, None, :]
    w = q * qt.scales[:, None, :]
    return w.reshape(K, N).astype(dtype)


def quantize_param(w: jax.Array, method: str, group: int = 128) -> AnyQuantTensor:
    if method == "int8":
        return quantize_int8(w, group)
    if method == "int4":
        return quantize_int4(w, group)
    raise ValueError(f"unknown quant method {method!r}")
