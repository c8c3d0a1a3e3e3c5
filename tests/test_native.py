"""Native C++ library: build, dequant parity with numpy, hash parity."""

import numpy as np
import pytest

from vllm_rs_tpu.native import (
    load_native,
    native_dequantize_ggml,
    native_hash_blocks,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="no C++ toolchain available"
)


class TestNativeDequant:
    @pytest.mark.parametrize("dtype", [2, 3, 6, 7, 8, 10, 11, 12, 13, 14])
    def test_matches_numpy(self, dtype):
        from tests.test_gguf import _random_blocks
        from vllm_rs_tpu.utils.gguf import _BLOCK_BYTES

        raw = _random_blocks(dtype, n_blocks=7, seed=dtype)
        got = native_dequantize_ggml(raw, dtype)
        # numpy reference path (bypass the native fast path)
        import vllm_rs_tpu.utils.gguf as gguf_mod
        import vllm_rs_tpu.native as native_mod

        orig = native_mod.native_dequantize_ggml
        native_mod.native_dequantize_ggml = lambda *a: None
        try:
            expect = gguf_mod.dequantize_ggml(raw, dtype)
        finally:
            native_mod.native_dequantize_ggml = orig
        np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-7)

    def test_f16_bf16(self):
        x = np.random.RandomState(0).randn(64).astype(np.float16)
        got = native_dequantize_ggml(x.view(np.uint8), 1)
        np.testing.assert_allclose(got, x.astype(np.float32), rtol=1e-3)


class TestNativeHash:
    def test_matches_python_chain(self):
        from vllm_rs_tpu.core.prefix_cache import ROOT_HASH, _hash_block

        rs = np.random.RandomState(0)
        tokens = rs.randint(0, 50000, size=64).astype(np.int32)
        block_size = 16
        got = native_hash_blocks(tokens, block_size)
        parent = ROOT_HASH
        for b in range(4):
            parent = _hash_block(parent, tokens[b * 16 : (b + 1) * 16])
            assert int(got[b]) == parent, b

    def test_prefix_cache_consistency(self):
        """block_hashes must agree between short (python) and long (native)
        prompts sharing a prefix."""
        from vllm_rs_tpu.core.prefix_cache import PrefixCache

        pc = PrefixCache(block_size=4)
        short = list(range(100, 112))  # 3 blocks → python path
        long = list(range(100, 132))  # 8 blocks → native path
        h_short = pc.block_hashes(short)
        h_long = pc.block_hashes(long)
        assert h_long[: len(h_short)] == h_short
