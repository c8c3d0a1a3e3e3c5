"""Vision-language tests: preprocessing, tower shapes, end-to-end injection."""

import io

import jax
import numpy as np
import pytest

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllm_rs_tpu.utils.image import ImageData, preprocess_image, smart_resize


def _png_bytes(w=64, h=48, color=(255, 0, 0)):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


class TestPreprocess:
    def test_smart_resize_bounds(self):
        h, w = smart_resize(1000, 1000, factor=28, min_pixels=56 * 56, max_pixels=28 * 28 * 64)
        assert h % 28 == 0 and w % 28 == 0
        assert h * w <= 28 * 28 * 64

    def test_patchify_shapes(self):
        img = preprocess_image(
            _png_bytes(64, 48), patch_size=8, spatial_merge=2,
            min_pixels=16 * 16, max_pixels=64 * 64,
        )
        gh, gw = img.grid
        assert img.patches.shape == (gh * gw, 3 * 8 * 8)
        assert img.num_tokens == (gh // 2) * (gw // 2)
        assert img.seed != 0

    def test_deterministic_seed(self):
        a = preprocess_image(_png_bytes(), patch_size=8, spatial_merge=2)
        b = preprocess_image(_png_bytes(), patch_size=8, spatial_merge=2)
        assert a.seed == b.seed


def _vl_engine():
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen_vl import QwenVLForCausalLM

    cfg = ModelConfig(
        model_type="qwen2_5_vl",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        eos_token_ids=(0,),
        extra=(
            ("image_token_id", 100),
            ("vision_patch_size", 8),
            ("vision_width", 32),
            ("vision_layers", 2),
            ("vision_heads", 2),
            ("vision_spatial_merge", 2),
        ),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=64, max_model_len=128, prefill_buckets=(16, 64)
        ),
        prefill_buckets=(16, 64),
        decode_buckets=(4,),
    )
    m = QwenVLForCausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec)), m


class TestVLEngine:
    def _image(self, color=(255, 0, 0)):
        return preprocess_image(
            _png_bytes(32, 32, color), patch_size=8, spatial_merge=2,
            min_pixels=16 * 16, max_pixels=64 * 64,
        )

    def test_generate_with_image(self):
        engine, _ = _vl_engine()
        img = self._image()
        # prompt: text, then one placeholder per image token, then text
        prompt = [5, 6] + [100] * img.num_tokens + [7, 8]
        outs_id = engine.add_request(
            prompt,
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
            images=[img],
        )
        while not engine.requests[outs_id].seq.is_finished:
            engine.step()
        assert len(engine.requests[outs_id].seq.output_token_ids) == 5

    def test_image_content_changes_output(self):
        """Different image pixels must change greedy generation."""
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

        def run(color):
            engine, _ = _vl_engine()
            img = self._image(color)
            prompt = [5, 6] + [100] * img.num_tokens + [7, 8]
            sid = engine.add_request(prompt, sp, images=[img])
            while not engine.requests[sid].seq.is_finished:
                engine.step()
            return engine.requests[sid].seq.output_token_ids

        assert run((255, 0, 0)) != run((0, 0, 255))

    def test_placeholder_count_mismatch_rejected(self):
        engine, _ = _vl_engine()
        img = self._image()
        with pytest.raises(ValueError):
            engine.add_request(
                [5, 100, 7],  # too few placeholders
                SamplingParams(max_tokens=2),
                images=[img],
            )


class TestMrope:
    def test_equal_components_match_standard_rope(self):
        import jax
        import jax.numpy as jnp

        from vllm_rs_tpu.ops.rope import apply_mrope, apply_rope

        key = jax.random.PRNGKey(0)
        B, T, H, D = 2, 5, 4, 32
        q = jax.random.normal(key, (B, T, H, D), jnp.float32)
        k = jax.random.normal(key, (B, T, H, D), jnp.float32)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, D, 2) / D))
        pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
        q1, k1 = apply_rope(q, k, pos, inv)
        mpos = jnp.tile(pos[:, None, :], (1, 3, 1))
        q2, k2 = apply_mrope(q, k, mpos, inv, (6, 5, 5))
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-5)

    def test_mrope_table_layout(self):
        from vllm_rs_tpu.models.qwen_vl import QwenVLForCausalLM

        cfg = ModelConfig(
            model_type="qwen2_5_vl", hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            vocab_size=128, eos_token_ids=(0,),
            extra=(("image_token_id", 100), ("vision_patch_size", 8),
                   ("vision_width", 32), ("vision_layers", 1),
                   ("vision_heads", 2), ("vision_spatial_merge", 2),
                   ("mrope_section", (4, 2, 2))),
        )
        m = QwenVLForCausalLM(cfg, block_size=4)
        img = type("I", (), {"grid": (4, 4), "num_tokens": 4})()
        toks = [5, 6] + [100] * 4 + [7]
        table, delta = m.build_mrope_table(toks, [img])
        # text positions 0,1; image at temporal pos 2 with 2x2 h/w grid
        assert list(table[0]) == [0, 1, 2, 2, 2, 2, 4]
        assert list(table[1, 2:6]) == [2, 2, 3, 3]
        assert list(table[2, 2:6]) == [2, 3, 2, 3]
        assert delta == 5 - 7  # next pos 5, physical len 7

    def test_vl_engine_with_mrope_generates(self):
        engine, _ = _vl_engine_mrope()
        img = preprocess_image(
            _png_bytes(32, 32), patch_size=8, spatial_merge=2,
            min_pixels=16 * 16, max_pixels=64 * 64,
        )
        prompt = [5, 6] + [100] * img.num_tokens + [7, 8]
        sid = engine.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
            images=[img],
        )
        while not engine.requests[sid].seq.is_finished:
            engine.step()
        assert len(engine.requests[sid].seq.output_token_ids) == 5


def _vl_engine_mrope():
    from vllm_rs_tpu.core.engine import LLMEngine
    from vllm_rs_tpu.core.runner import ModelRunner
    from vllm_rs_tpu.models.qwen_vl import QwenVLForCausalLM

    cfg = ModelConfig(
        model_type="qwen2_5_vl", hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, eos_token_ids=(0,),
        extra=(("image_token_id", 100), ("vision_patch_size", 8),
               ("vision_width", 32), ("vision_layers", 2),
               ("vision_heads", 2), ("vision_spatial_merge", 2),
               ("mrope_section", (4, 2, 2))),
    )
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=4, chunk_size=64, max_model_len=128, prefill_buckets=(16, 64)
        ),
        prefill_buckets=(16, 64),
        decode_buckets=(4,),
    )
    m = QwenVLForCausalLM(cfg, block_size=4)
    params = m.init_params(jax.random.PRNGKey(0))
    return LLMEngine(ec, ModelRunner(m, params, ec)), m


class TestDeepstack:
    def _engine(self):
        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner
        from vllm_rs_tpu.models.qwen_vl import QwenVLForCausalLM

        cfg = ModelConfig(
            model_type="qwen3_vl", hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            vocab_size=128, eos_token_ids=(0,),
            extra=(("image_token_id", 100), ("vision_patch_size", 8),
                   ("vision_width", 32), ("vision_layers", 3),
                   ("vision_heads", 2), ("vision_spatial_merge", 2),
                   ("deepstack_visual_indexes", (0, 1))),
        )
        ec = EngineConfig(
            model=cfg,
            cache=CacheConfig(block_size=4, num_blocks=64),
            scheduler=SchedulerConfig(
                max_num_seqs=4, chunk_size=64, max_model_len=128,
                prefill_buckets=(16, 64),
            ),
            prefill_buckets=(16, 64),
            decode_buckets=(4,),
        )
        m = QwenVLForCausalLM(cfg, block_size=4)
        params = m.init_params(jax.random.PRNGKey(0))
        return LLMEngine(ec, ModelRunner(m, params, ec)), m

    def test_deepstack_generates(self):
        engine, m = self._engine()
        assert m.n_deepstack == 2
        img = preprocess_image(
            _png_bytes(32, 32), patch_size=8, spatial_merge=2,
            min_pixels=16 * 16, max_pixels=64 * 64,
        )
        prompt = [5, 6] + [100] * img.num_tokens + [7]
        sid = engine.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
            images=[img],
        )
        seq = engine.requests[sid].seq
        assert seq.mm_deepstack is not None and seq.mm_deepstack.shape[0] == 2
        while not seq.is_finished:
            engine.step()
        assert len(seq.output_token_ids) == 5

    def test_deepstack_changes_output(self):
        """Zeroing deepstack features must change greedy output (the levels
        are actually injected)."""
        import numpy as np

        def run(zero_ds):
            engine, _ = self._engine()
            img = preprocess_image(
                _png_bytes(32, 32), patch_size=8, spatial_merge=2,
                min_pixels=16 * 16, max_pixels=64 * 64,
            )
            prompt = [5, 6] + [100] * img.num_tokens + [7]
            sid = engine.add_request(
                prompt,
                SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
                images=[img],
            )
            seq = engine.requests[sid].seq
            if zero_ds:
                seq.mm_deepstack = np.zeros_like(seq.mm_deepstack)
            while not seq.is_finished:
                engine.step()
            return seq.output_token_ids

        assert run(False) != run(True)
