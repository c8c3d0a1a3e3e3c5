"""Pallas TPU kernels — the equivalents of the reference's attention-rs
CUDA/Metal crate (SURVEY.md §2.5): fused dequant matmul, paged attention.

Every kernel runs in interpret mode off-TPU so the exact kernel code paths
are testable on CPU (tests/test_pallas_*.py)."""
