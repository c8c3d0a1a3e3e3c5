"""Weight quantization: canonical TPU formats + checkpoint-format converters.

Canonical on-device formats (see pack.py):
  - int8 symmetric, group-wise scales
  - int4 (jnp.int4, XLA packs 2/byte) asymmetric, group-wise scales + zeros

Checkpoint formats (GGUF K-quants, GPTQ, AWQ) are converted to a canonical
format at load time — the TPU analogue of the reference's ISQ path
(linear.rs:352-399) and its Marlin repack (wna16.rs). The matmul kernels
only ever see canonical layouts.
"""

from vllm_rs_tpu.quant.pack import (  # noqa: F401
    PackedInt4Tensor,
    QuantizedTensor,
    dequantize,
    pack_int4,
    quantize_int4,
    quantize_int8,
    unpack_int4,
)
