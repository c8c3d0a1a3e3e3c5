"""Embedding API: EngineBuilder / LLM.

Counterpart of the reference's Rust crate surface (src/api.rs:26-309
EngineBuilder → Engine::{generate, generate_stream, start_server}) and its
PyO3 mirror (src/py/mod.rs). This is the one-stop constructor: checkpoint
(safetensors dir or GGUF file) → tokenizer + config + params + sized KV
cache + engine.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from typing import List, Optional, Union

from vllm_rs_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
    plan_kv_cache,
)

logger = logging.getLogger(__name__)


@dataclass
class EngineBuilder:
    """Fluent engine construction (reference api.rs:26-120)."""

    model_path: str
    # "auto" (default): int4 ISQ for FP4 checkpoints so weights stream at
    # 4-bit, no ISQ otherwise; None/"none" | "int8" | "int4" override
    # (reference api.rs isq option; FP4 streaming: linear.rs:1080-1306)
    quant: Optional[str] = "auto"
    quant_group: int = 128
    block_size: int = 16
    max_model_len: int = 8192
    max_num_seqs: int = 64
    chunk_size: int = 2048
    # tokens decoded per host↔device sync (on-device multi-step loop);
    # >1 trades per-token streaming granularity for step-dispatch
    # amortization — decisive on high-RTT links (PERF_NOTES r3 #7)
    multi_step: int = 1
    # smooth ITL for streaming clients under multi-step: bursts are paced
    # across the next step's duration (core/pacer.py). Measured ~15%
    # throughput cost at 64-stream saturation (the fresh-stream k-ramp,
    # floored at k/8, takes a few shallow bursts per admission)
    stream_pacing: bool = False
    # admission coalescing under staggered arrivals (see SchedulerConfig
    # .admission_coalesce_rows): 1 = immediate admission
    admission_coalesce: int = 1
    kv_dtype: str = "bfloat16"
    num_blocks: int = 0  # 0 → plan from free memory
    tp_size: int = 1
    dp_size: int = 1
    seed: int = 0
    prefix_cache: bool = True
    # CLI-supplied YaRN rope-scaling factor (reference --yarn-scaling-factor,
    # utils/mod.rs:640-706): 0 = use the checkpoint's rope_scaling as-is
    yarn_scaling_factor: float = 0.0

    def build(self):
        import jax

        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner

        # model path or HF Hub id → local artifacts (reference downloader.rs;
        # CLI --m <id> / --w <path> duality). Local paths pass through; hub
        # ids download when egress exists, else error with guidance.
        from vllm_rs_tpu.utils.download import resolve_model

        mp = resolve_model(os.path.expanduser(self.model_path))
        path = mp.model_dir
        # resolve quant="auto" here so the engine config records the ISQ
        # format actually applied (FP4 checkpoints → int4; see
        # utils/loader.py resolve_auto_quant)
        quant = self.quant
        if quant == "none":
            quant = None
        if quant == "auto":
            if mp.is_gguf:
                quant = None  # GGUF tensors are already quantized
            else:
                from vllm_rs_tpu.utils.loader import (
                    SafetensorsDir, resolve_auto_quant,
                )

                quant, _ = resolve_auto_quant(
                    SafetensorsDir(path), "auto", self.quant_group
                )
        if mp.is_gguf:
            from vllm_rs_tpu.utils.loader import load_gguf_model

            gguf_path = mp.weight_files[0]
            model, params = load_gguf_model(
                gguf_path, quant=quant, quant_group=self.quant_group,
                block_size=self.block_size,
            )
            tokenizer = _tokenizer_near(path)
            if tokenizer is None:  # reconstruct from GGUF metadata
                from vllm_rs_tpu.utils.gguf import GGUFFile, tokenizer_from_gguf

                tokenizer = tokenizer_from_gguf(GGUFFile(gguf_path))
        else:
            from vllm_rs_tpu.utils.loader import load_model

            model, params = load_model(
                path, quant=quant, quant_group=self.quant_group,
                block_size=self.block_size,
                yarn_scaling_factor=self.yarn_scaling_factor,
            )
            tokenizer = _tokenizer_near(path)

        config = model.config
        max_len = min(self.max_model_len, config.max_position_embeddings)
        if self.num_blocks:
            cache = CacheConfig(
                block_size=self.block_size, num_blocks=self.num_blocks,
                kv_dtype=self.kv_dtype,
            )
        else:
            free = _free_device_bytes()
            cache = plan_kv_cache(
                config, hbm_bytes_free=free, block_size=self.block_size,
                kv_dtype=self.kv_dtype, tp_size=self.tp_size,
            )
        sched = SchedulerConfig(
            max_num_seqs=self.max_num_seqs,
            chunk_size=self.chunk_size,
            max_model_len=max_len,
            prefix_cache_enabled=self.prefix_cache,
            multi_step_decode=self.multi_step,
            stream_pacing=self.stream_pacing,
            admission_coalesce_rows=self.admission_coalesce,
        )
        econfig = EngineConfig(
            model=config, cache=cache, scheduler=sched,
            quant=quant, quant_group=self.quant_group,
            tp_size=self.tp_size, dp_size=self.dp_size, seed=self.seed,
        )
        mesh = None
        if self.tp_size * self.dp_size > 1:
            from vllm_rs_tpu.parallel import make_mesh, shard_params

            mesh = make_mesh(tp_size=self.tp_size, dp_size=self.dp_size)
            params = shard_params(params, mesh)
        runner = ModelRunner(model, params, econfig, mesh=mesh)
        engine = LLMEngine(econfig, runner, tokenizer=tokenizer)
        # generation_config.json defaults (reference GenerationConfig,
        # config.rs:735-757): applied by the servers to unset sampling knobs
        if mp.generation_config:
            with open(mp.generation_config) as f:
                engine.generation_defaults = json.load(f)
        else:
            engine.generation_defaults = {}
        logger.info(
            "engine ready: %s, %d KV blocks x %d, max_len %d",
            config.model_type, cache.num_blocks, cache.block_size, max_len,
        )
        return engine


def _tokenizer_near(path: str):
    """Load tokenizer.json next to the checkpoint (HF tokenizers)."""
    tj = os.path.join(path, "tokenizer.json")
    if os.path.exists(tj):
        from tokenizers import Tokenizer

        return Tokenizer.from_file(tj)
    logger.warning("no tokenizer.json under %s — token-id API only", path)
    return None


def _free_device_bytes() -> int:
    """Free HBM on the first device (reference kvcache_allocator.rs:479-543)."""
    import jax

    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        limit = stats.get("bytes_limit", 0)
        used = stats.get("bytes_in_use", 0)
        if limit:
            return int(limit - used)
    except Exception:  # pragma: no cover — platform without memory_stats
        pass
    return 4 << 30  # conservative CPU/testing default


class LLM:
    """Convenience synchronous wrapper (reference example/completion.py)."""

    def __init__(self, model_path: str, **kw):
        self.engine = EngineBuilder(model_path, **kw).build()

    def generate(
        self,
        prompts: Union[str, List[str]],
        sampling_params: Optional[SamplingParams] = None,
    ):
        if isinstance(prompts, str):
            prompts = [prompts]
        return self.engine.generate(prompts, sampling_params)
