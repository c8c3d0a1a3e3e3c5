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
