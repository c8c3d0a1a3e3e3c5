"""MXFP4 / NVFP4 checkpoint formats → TPU-native canonical weights.

Counterpart of the reference's `LnMxfp4` / `LnNvfp4` loaders
(src/models/layers/linear.rs:1080-1144, 1159-1306) and their
`mxfp4_matmul` / `nvfp4_matmul` CUDA kernels. TPUs have no FP4 datapath,
so the TPU-first design is a *load-time* transform, not a runtime kernel:

- decode the packed E2M1 nibbles with a 16-entry LUT,
- apply the block scales (E8M0 per 32 for MXFP4; FP8-E4M3 per 16 plus a
  global f32 multiplier for NVFP4),
- materialize **bf16** — every E2M1 x E8M0 product is exactly
  representable in bf16 (2 significand bits + power-of-two scale), and
  the NVFP4 product fits in 6 significand bits, so the conversion is
  (near-)lossless — then optionally in-situ requantize to the canonical
  int4/int8 formats the Pallas matmul kernels consume (the reference's
  ISQ analog, linear.rs:352-399).

Layouts (reference linear.rs load()):
- MXFP4: blocks u8 [N, K/2] (`weight_packed` or `blocks`), scales u8
  [N, K/32] (`weight_scale` or `scales`), value = e2m1(nibble) *
  2^(scale-127). 2 elements per byte, LOW nibble = even k.
- NVFP4: blocks u8 [N, K/2] (`weight_packed`/`weight`/`blocks`), scales
  f8e4m3-as-u8 [N, K/16], global multiplier from `weight_scale_2`
  (modelopt, direct) or 1/`weight_global_scale` (compressed-tensors,
  divisor). The activation-side `input_scale` is ignored: activations
  stay bf16 on TPU, matching the reference's own non-SM100 software path
  (linear.rs:1233 "For the software path ... this is ignored").
"""

from __future__ import annotations

import numpy as np

# E2M1 value table, indexed by the 4-bit code (sign bit 3, exp bits 2:1,
# mantissa bit 0): 0, 0.5, 1, 1.5, 2, 3, 4, 6 and negatives.
E2M1_LUT = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
)


def decode_e2m1(packed: np.ndarray) -> np.ndarray:
    """u8 [..., K/2] (2 nibbles/byte, low nibble first) → f32 [..., K]."""
    packed = np.asarray(packed, dtype=np.uint8)
    lo = E2M1_LUT[packed & 0x0F]
    hi = E2M1_LUT[packed >> 4]
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), dtype=np.float32)
    out[..., 0::2] = lo
    out[..., 1::2] = hi
    return out


def decode_e8m0(scales: np.ndarray) -> np.ndarray:
    """u8 E8M0 exponent-only scales → f32 2^(u8-127); 255 (NaN) → 0."""
    s = np.asarray(scales, dtype=np.uint8)
    e = np.where(s == 255, 0, s).astype(np.float32) - 127.0  # 255 = NaN code
    return np.where(s == 255, 0.0, np.exp2(e))


def decode_e4m3(scales_u8: np.ndarray) -> np.ndarray:
    """u8 bit patterns of float8_e4m3fn → f32."""
    try:
        import ml_dtypes

        return np.asarray(scales_u8, dtype=np.uint8).view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    except ImportError:  # pragma: no cover - ml_dtypes ships with jax
        s = np.asarray(scales_u8, dtype=np.uint8)
        sign = np.where(s >> 7, -1.0, 1.0).astype(np.float32)
        exp = ((s >> 3) & 0x0F).astype(np.int32)
        man = (s & 0x07).astype(np.float32)
        normal = sign * (1.0 + man / 8.0) * np.exp2(exp - 7.0)
        sub = sign * (man / 8.0) * np.exp2(-6.0)
        return np.where(exp == 0, sub, normal).astype(np.float32)


def mxfp4_dequant(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """blocks u8 [N, K/2] + E8M0 scales u8 [N, K/32] → f32 [N, K]."""
    vals = decode_e2m1(blocks)  # [N, K]
    s = decode_e8m0(scales)  # [N, K/32]
    K = vals.shape[-1]
    group = K // s.shape[-1]
    return vals * np.repeat(s, group, axis=-1)


def nvfp4_dequant(
    blocks: np.ndarray, scales_u8: np.ndarray, global_scale: float = 1.0
) -> np.ndarray:
    """blocks u8 [N, K/2] + E4M3 scales [N, K/16] + f32 global → f32 [N, K]."""
    vals = decode_e2m1(blocks)
    s = decode_e4m3(scales_u8)
    K = vals.shape[-1]
    group = K // s.shape[-1]
    return vals * np.repeat(s, group, axis=-1) * np.float32(global_scale)


# -- encoders (tests + ISQ round trips) -------------------------------------


def encode_e2m1(x: np.ndarray) -> np.ndarray:
    """f32 [..., K] → u8 [..., K/2]; nearest E2M1 code, ties to even index."""
    x = np.asarray(x, dtype=np.float32)
    codes = np.abs(x[..., None] - E2M1_LUT[None, :]).argmin(axis=-1).astype(np.uint8)
    lo, hi = codes[..., 0::2], codes[..., 1::2]
    return (lo | (hi << 4)).astype(np.uint8)


def quantize_mxfp4(w: np.ndarray) -> tuple:
    """f32 [N, K] → (blocks u8 [N, K/2], scales u8 [N, K/32]). Power-of-two
    per-32-block scale chosen so the max magnitude maps to ±6."""
    N, K = w.shape
    g = w.reshape(N, K // 32, 32)
    amax = np.abs(g).max(axis=-1)
    exp = np.where(amax > 0, np.ceil(np.log2(np.maximum(amax, 1e-30) / 6.0)), 0.0)
    exp = np.clip(exp, -127, 127)
    scales = (exp + 127).astype(np.uint8)
    scaled = g / np.exp2(exp)[..., None]
    return encode_e2m1(scaled.reshape(N, K)), scales
