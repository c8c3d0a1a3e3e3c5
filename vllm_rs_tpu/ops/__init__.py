"""Device-side ops: paged KV cache primitives, attention (jnp reference +
Pallas TPU kernels), rotary embeddings, activations, and sampling.

Every Pallas kernel has a pure-jnp reference implementation used for
CPU tests and as the numerical ground truth (mirrors how the reference's
attention-rs kernels relate to its fallback paths).
"""
