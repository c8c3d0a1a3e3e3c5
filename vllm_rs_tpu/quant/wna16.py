"""GPTQ / AWQ (weight-only 4/8-bit) checkpoint conversion.

Counterpart of the reference's WNA16 loader (src/models/layers/wna16.rs:
qweight/qzeros/scales/g_idx parsing + Marlin repack). On TPU there is no
Marlin: checkpoints are converted once at load time into the canonical
split-half PackedInt4Tensor / QuantizedTensor formats (quant/pack.py) that
the Pallas dequant-matmul kernels consume. Conversion is exact for
uniform-group checkpoints (the packed integers and scales are carried over
bit-for-bit); act-order (g_idx) checkpoints dequantize to bf16 through the
permutation and requantize group-wise.

Packing conventions (public GPTQ/AWQ checkpoint formats):
- GPTQ: qweight int32 [K/8, N], 8 nibbles per word along K, row-major
  within the word (bits 4i..4i+4 = row 8r+i); qzeros int32 [K/G, N/8]
  packed the same way along N, stored with the historical -1 offset
  (true zero-point = stored + 1); scales f16/f32 [K/G, N]; optional g_idx
  int32 [K] mapping each row to its group (act-order).
- AWQ: qweight int32 [K, N/8] packed along N with the interleaved order
  [0, 2, 4, 6, 1, 3, 5, 7]; qzeros [K/G, N/8] same packing; no offset.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.quant.pack import PackedInt4Tensor, pack_int4, quantize_int4

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_int32_nibbles(packed: np.ndarray, axis: int) -> np.ndarray:
    """int32 array → uint8 nibbles expanded 8x along `axis` (order: bit 4i)."""
    u = packed.astype(np.uint32)
    parts = [((u >> (4 * i)) & 0xF).astype(np.uint8) for i in range(8)]
    return np.stack(parts, axis=axis + 1).reshape(
        tuple(s * 8 if a == axis else s for a, s in enumerate(packed.shape))
    )


def unpack_gptq_weight(qweight: np.ndarray) -> np.ndarray:
    """GPTQ qweight int32 [K/8, N] → uint8 [K, N] in [0, 15]."""
    return _unpack_int32_nibbles(qweight, axis=0)


def unpack_gptq_zeros(qzeros: np.ndarray) -> np.ndarray:
    """GPTQ qzeros int32 [K/G, N/8] → uint8 [K/G, N]; +1 offset applied."""
    z = _unpack_int32_nibbles(qzeros, axis=1)
    return ((z.astype(np.int32) + 1) & 0xF).astype(np.uint8)


def unpack_awq(packed: np.ndarray) -> np.ndarray:
    """AWQ int32 [*, N/8] → uint8 [*, N] undoing the interleave order."""
    u = packed.astype(np.uint32)
    parts = [((u >> (4 * int(i)) ) & 0xF).astype(np.uint8) for i in AWQ_ORDER]
    return np.stack(parts, axis=packed.ndim).reshape(*packed.shape[:-1], -1)


def gptq_to_canonical(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
    bits: int = 4,
) -> object:
    """GPTQ tensors → canonical quantized linear weight [K, N].

    Uniform groups convert exactly; act-order g_idx falls back to
    dequantize→requantize (reference wna16.rs handles this with an exllama
    reorder; the requantize here matches its numerics at group granularity).
    """
    assert bits == 4, f"only 4-bit GPTQ supported, got {bits}"
    q = unpack_gptq_weight(qweight)  # [K, N] in [0, 16)
    K, N = q.shape
    G = K // scales.shape[0]
    zeros = unpack_gptq_zeros(qzeros)  # [K/G, N]
    scales = scales.astype(np.float32)

    nontrivial_gidx = g_idx is not None and not np.array_equal(
        np.asarray(g_idx), np.arange(K) // G
    )
    if nontrivial_gidx:
        w = (
            q.astype(np.float32) - zeros[np.asarray(g_idx)].astype(np.float32)
        ) * scales[np.asarray(g_idx)]
        return quantize_int4(jnp.asarray(w, dtype=jnp.float32), group=G)

    # exact 4-bit conversion: q∈[0,15] → q-8∈[-8,7]; zero → zero-8
    qs = (q.astype(np.int32) - 8).astype(np.int8)
    zf = zeros.astype(np.float32) - 8.0
    return PackedInt4Tensor(
        pack_int4(jnp.asarray(qs)),
        jnp.asarray(scales),
        jnp.asarray(zf),
    )


def awq_to_canonical(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
) -> PackedInt4Tensor:
    """AWQ tensors → canonical PackedInt4Tensor [K, N] (exact)."""
    q = unpack_awq(qweight)  # [K, N]
    zeros = unpack_awq(qzeros)  # [K/G, N]
    qs = (q.astype(np.int32) - 8).astype(np.int8)
    zf = zeros.astype(np.float32) - 8.0
    return PackedInt4Tensor(
        pack_int4(jnp.asarray(qs)),
        jnp.asarray(scales.astype(np.float32)),
        jnp.asarray(zf),
    )
