"""Quantized matmul dispatch: y = x @ dequant(W).

Counterpart of the reference's LinearX quant dispatch (linear.rs:519-619)
and its fused dequant GEMMs (Marlin / GGUF QMatMul / fp8_matmul). On TPU the
Pallas kernel streams int4/int8 weight tiles HBM→VMEM and dequantizes
in-register before hitting the MXU; the jnp reference materializes the
dequantized weight (CPU tests only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_rs_tpu.quant.pack import AnyQuantTensor, dequantize


def quant_matmul_reference(x: jax.Array, qt: AnyQuantTensor) -> jax.Array:
    w = dequantize(qt, dtype=jnp.bfloat16)
    return jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def quant_matmul(x: jax.Array, qt, backend: str = "auto") -> jax.Array:
    from vllm_rs_tpu.quant.fp8 import Fp8BlockTensor, fp8_matmul

    if isinstance(qt, Fp8BlockTensor):
        return fp8_matmul(x, qt)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend == "pallas":
        from vllm_rs_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

        return quant_matmul_pallas(x, qt)
    return quant_matmul_reference(x, qt)
