"""FP8 block-wise weight quantization (DeepSeek/compressed-tensors format).

Counterpart of the reference's LnFp8 blockwise FP8 path (linear.rs:776-1076):
weights stored as float8_e4m3fn with one float32 scale per (128, 128) block
(`weight_scale_inv` in DeepSeek V3 checkpoints). TPU v5e has no native fp8
MXU mode, so the matmul path converts f8→bf16 on read (1 byte/weight HBM
traffic, same as int8) and folds the block scales in; v6e+ can switch to a
native-dot kernel without changing the storage format.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Fp8BlockTensor(NamedTuple):
    """[K, N] f8e4m3 data + [ceil(K/Bk), ceil(N/Bn)] f32 block scales."""

    qweight: jax.Array
    scales: jax.Array
    block_shape: Tuple[int, int] = (128, 128)

    @property
    def shape(self):
        return self.qweight.shape


def quantize_fp8_block(w: jax.Array, block: Tuple[int, int] = (128, 128)) -> Fp8BlockTensor:
    """Per-block absmax scaling into float8_e4m3fn (fp8 max ±448)."""
    K, N = w.shape
    Bk, Bn = block
    assert K % Bk == 0 and N % Bn == 0, (K, N, block)
    wf = w.astype(jnp.float32).reshape(K // Bk, Bk, N // Bn, Bn)
    amax = jnp.max(jnp.abs(wf), axis=(1, 3))  # [K/Bk, N/Bn]
    scales = jnp.maximum(amax / 448.0, 1e-12)
    q = (wf / scales[:, None, :, None]).astype(jnp.float8_e4m3fn)
    return Fp8BlockTensor(q.reshape(K, N), scales, block)


def dequantize_fp8_block(qt: Fp8BlockTensor, dtype=jnp.bfloat16) -> jax.Array:
    K, N = qt.qweight.shape
    Bk, Bn = qt.block_shape
    wf = qt.qweight.astype(jnp.float32).reshape(K // Bk, Bk, N // Bn, Bn)
    wf = wf * qt.scales[:, None, :, None]
    return wf.reshape(K, N).astype(dtype)


def fp8_matmul(x: jax.Array, qt: Fp8BlockTensor) -> jax.Array:
    """y = x @ dequant(qt): convert-in-dot with block scales folded after
    per-block partial products (keeps the f8 bytes as the HBM stream)."""
    K, N = qt.qweight.shape
    Bk, Bn = qt.block_shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    M = x2.shape[0]
    # group x along K-blocks; one dot per K-block row then scale per N-block
    xg = x2.reshape(M, K // Bk, Bk)
    wg = qt.qweight.reshape(K // Bk, Bk, N)
    p = jnp.einsum(
        "mkb,kbn->kmn", xg, wg.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [K/Bk, M, N]
    s = jnp.repeat(qt.scales, Bn, axis=1)  # [K/Bk, N]
    y = jnp.sum(p * s[:, None, :], axis=0)
    return y.reshape(*lead, N).astype(x.dtype)
