"""Configuration types.

Behavioral counterpart of the reference's `src/utils/config.rs` (Config /
EngineConfig / SamplingParams / GenerationConfig / QuantConfig, see
reference config.rs:219-757), redesigned for a jax/XLA engine: everything
that feeds a jitted step function is static and hashable; per-request
knobs live in SamplingParams and are turned into device arrays by the
runner.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _gemma4_extra(cfg: dict) -> list:
    """Gemma4 heterogeneous-attention knobs (reference gemma4.rs:594-745,
    utils/mod.rs:1032 gemma4_per_layer_cache_config) → extra pairs."""
    extra = []
    for k in (
        "global_head_dim", "num_global_key_value_heads",
        "hidden_size_per_layer_input", "num_kv_shared_layers",
    ):
        if cfg.get(k):
            extra.append((k, int(cfg[k])))
    if cfg.get("rope_local_base_freq"):
        extra.append(("rope_local_base_freq", float(cfg["rope_local_base_freq"])))
    for k in ("attention_k_eq_v", "use_double_wide_mlp"):
        if cfg.get(k):
            extra.append((k, True))
    if cfg.get("enable_moe_block") is not None:
        extra.append(("enable_moe_block", bool(cfg["enable_moe_block"])))
    lt = cfg.get("layer_types")
    if isinstance(lt, list):
        extra.append(
            (
                "gemma4_layer_types",
                tuple("full" if t == "full_attention" else "sliding" for t in lt),
            )
        )
    return extra


def _vision_extra(cfg: dict) -> list:
    """HF `vision_config` (+ image token ids, mrope sections) → extras the
    VL tower reads (models/qwen_vl.py, models/vision.py). Mirrors the
    reference's get_image_config (qwen3_vl/config.rs)."""
    extra = []
    for top in ("image_token_id", "video_token_id", "vision_start_token_id"):
        if cfg.get(top) is not None:
            extra.append((top, int(cfg[top])))
    if cfg.get("image_token_index") is not None:  # gemma3 naming
        extra.append(("image_token_id", int(cfg["image_token_index"])))
    if cfg.get("mm_tokens_per_image"):
        extra.append(("mm_tokens_per_image", int(cfg["mm_tokens_per_image"])))
    if cfg.get("spatial_merge_size"):  # mistral3 top-level (Mistral3Config)
        extra.append(("vision_spatial_merge", int(cfg["spatial_merge_size"])))
    vc = cfg.get("vision_config")
    if isinstance(vc, dict):
        m = {
            "patch_size": "vision_patch_size",
            "hidden_size": "vision_width",
            "depth": "vision_layers",
            "num_hidden_layers": "vision_layers",  # siglip naming (gemma3)
            "num_heads": "vision_heads",
            "num_attention_heads": "vision_heads",
            "image_size": "vision_image_size",
            "intermediate_size": "vision_intermediate",
            "spatial_merge_size": "vision_spatial_merge",
            "temporal_patch_size": "vision_temporal_patch",
            "num_position_embeddings": "vision_num_pos",
            "out_hidden_size": "vision_out_hidden",
            "head_dim": "vision_head_dim",
        }
        for hf, ours in m.items():
            if vc.get(hf):
                extra.append((ours, int(vc[hf])))
        if vc.get("rope_theta"):
            extra.append(("vision_rope_theta", float(vc["rope_theta"])))
        dsi = vc.get("deepstack_visual_indexes")
        if isinstance(dsi, list):
            extra.append(("deepstack_visual_indexes", tuple(dsi)))
    rs = cfg.get("rope_scaling") or {}
    if isinstance(rs, dict) and isinstance(rs.get("mrope_section"), list):
        extra.append(("mrope_section", tuple(rs["mrope_section"])))
    return extra


def _llama4_extra(cfg: dict) -> list:
    """Llama4 text knobs (reference llama4/config.rs + mod.rs:189-240):
    iRoPE layer pattern, chunked attention, interleaved MoE layers,
    separate dense-MLP width."""
    extra = []
    for k in ("interleave_moe_layer_step", "attention_chunk_size",
              "intermediate_size_mlp"):
        if cfg.get(k):
            extra.append((k, int(cfg[k])))
    nrl = cfg.get("no_rope_layers")
    if isinstance(nrl, list):  # HF: 1 = rope, 0 = nope
        extra.append(("no_rope_layers", tuple(int(x) for x in nrl)))
    ml = cfg.get("moe_layers")
    if isinstance(ml, list):
        extra.append(("moe_layers", tuple(int(x) for x in ml)))
    return extra


def _hybrid_extra(cfg: dict, mt: str) -> tuple:
    """Qwen3.5/Qwen3-Next hybrid GDN knobs → hashable extra tuple."""
    vision = (
        _vision_extra(cfg)
        if ("vision_config" in cfg or "image_token_id" in cfg or "image_token_index" in cfg)
        else []
    )
    if mt == "gemma4":
        return tuple(_gemma4_extra(cfg) + vision)
    if mt in ("llama4", "llama4_text"):
        return tuple(_llama4_extra(cfg) + vision)
    if vision and mt not in ("qwen3_next", "qwen3_5", "qwen3_5_moe"):
        return tuple(vision)
    if mt not in ("qwen3_next", "qwen3_5", "qwen3_5_moe") and not any(
        k.startswith("linear_") for k in cfg
    ):
        return ()
    extra = []
    for k in (
        "linear_num_key_heads", "linear_num_value_heads",
        "linear_key_head_dim", "linear_value_head_dim",
        "linear_conv_kernel_dim", "full_attention_interval",
    ):
        if cfg.get(k) is not None:
            extra.append((k, int(cfg[k])))
    lt = cfg.get("layer_types")
    if isinstance(lt, list) and "linear_attention" in lt:
        extra.append(
            (
                "layer_types_hybrid",
                tuple("linear" if t == "linear_attention" else "full" for t in lt),
            )
        )
    return tuple(extra)


# ---------------------------------------------------------------------------
# Model configuration (HF config.json superset; reference config.rs:219-282)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture description consumed by model code.

    Frozen + hashable so it can be a static argument of jitted functions.
    """

    model_type: str = "llama"
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 0  # 0 → hidden_size // num_attention_heads
    vocab_size: int = 128256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling: Optional[tuple] = None  # ("type", factor, ...) tuple, hashable
    partial_rotary_factor: float = 1.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    # qwen3-style per-head q/k RMSNorm
    qk_norm: bool = False
    # minimax-style per-head q/k L2 normalization (attention.rs:749-757)
    qk_l2_norm: bool = False
    # llama4 position-dependent attention temperature (attention.rs:783-798)
    attn_temperature_tuning: bool = False
    attn_floor_scale: float = 8192.0
    attn_scale_coef: float = 0.1
    # gemma-style (weight + 1) norm semantics and embedding scaling
    norm_plus_one: bool = False
    # gemma2/3/4 sandwich norms: post-attn norm before the residual add plus
    # pre/post feedforward norms (reference gemma3/ and gemma4.rs:485-536)
    sandwich_norms: bool = False
    embed_scale: float = 1.0
    # logit softcapping (gemma2/3)
    final_logit_softcap: float = 0.0
    attn_logit_softcap: float = 0.0
    # sliding window attention: 0 = disabled; pattern controls which layers
    sliding_window: int = 0
    # every `sliding_window_pattern`-th layer is global, others sliding (gemma3)
    sliding_window_pattern: int = 1
    # explicit per-layer window sizes (0 = global); overrides the pattern.
    # derived from HF `layer_types` or the pattern in from_hf_dict
    layer_windows: tuple = ()
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    # scoring for router: "softmax" | "sigmoid"
    router_scoring: str = "softmax"
    # DeepSeek group-limited routing (reference moe.rs:69-130)
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    # leading dense (non-MoE) decoder layers (deepseek/glm4-moe)
    first_k_dense_replace: int = 0
    # router e_score_correction_bias present (deepseek noaux_tc)
    router_bias: bool = False
    # qwen2-moe style sigmoid gate on the shared expert output
    shared_expert_gate: bool = False
    # MLA (DeepSeek-style multi-head latent attention, mla_attention.rs)
    q_lora_rank: int = 0  # 0 = direct q projection
    kv_lora_rank: int = 0  # 0 = no MLA, standard GQA
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    eos_token_ids: tuple = ()
    bos_token_id: int = -1
    dtype: str = "bfloat16"
    # extra per-arch knobs that don't merit first-class fields
    extra: tuple = ()

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim_ * self.partial_rotary_factor)

    def extra_get(self, key: str, default=None):
        for k, v in self.extra:
            if k == key:
                return v
        return default

    @staticmethod
    def from_hf_dict(cfg: dict, model_type: Optional[str] = None) -> "ModelConfig":
        """Build from a parsed HF config.json dict.

        Mirrors the reference's Config::from (config.rs:219-282) including
        defaults for absent fields.
        """
        # some configs nest under "text_config" (multimodal)
        if "text_config" in cfg and "hidden_size" not in cfg:
            merged = dict(cfg)
            merged.update(cfg["text_config"])
            cfg = merged
        mt = model_type or cfg.get("model_type", "llama")
        hidden = cfg.get("hidden_size", 4096)
        n_heads = cfg.get("num_attention_heads", 32)
        eos = cfg.get("eos_token_id", [])
        if isinstance(eos, int):
            eos = [eos]
        rope_scaling = cfg.get("rope_scaling") or None
        if rope_scaling:
            rope_scaling = tuple(
                sorted(
                    (
                        (k, tuple(v) if isinstance(v, list) else v)
                        for k, v in rope_scaling.items()
                    ),
                    key=lambda kv: kv[0],
                )
            )
        # per-layer sliding windows (gemma3-style): HF `layer_types` list, or
        # every sliding_window_pattern-th layer global
        sw = cfg.get("sliding_window", 0) or 0
        swp = cfg.get("sliding_window_pattern", 1) or 1
        L = cfg.get("num_hidden_layers", 32)
        layer_windows: tuple = ()
        if isinstance(cfg.get("layer_types"), list):
            layer_windows = tuple(
                sw if t == "sliding_attention" else 0 for t in cfg["layer_types"]
            )
        elif mt == "gemma4" and sw:
            # gemma4 default pattern: every 6th layer global (gemma4.rs:623-631)
            layer_windows = tuple(sw if (i + 1) % 6 != 0 else 0 for i in range(L))
        elif sw and swp > 1:
            layer_windows = tuple(
                sw if (i + 1) % swp != 0 else 0 for i in range(L)
            )
        return ModelConfig(
            model_type=mt,
            hidden_size=hidden,
            intermediate_size=cfg.get("intermediate_size", 4 * hidden),
            num_hidden_layers=cfg.get("num_hidden_layers", 32),
            num_attention_heads=n_heads,
            num_key_value_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=cfg.get("head_dim", 0) or 0,
            vocab_size=cfg.get("vocab_size", 32000),
            max_position_embeddings=cfg.get("max_position_embeddings", 8192),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=rope_scaling,
            partial_rotary_factor=cfg.get("partial_rotary_factor", 1.0),
            tie_word_embeddings=cfg.get(
                "tie_word_embeddings",
                mt.startswith("gemma"),  # gemma ties by default (gemma4.rs:935)
            ),
            attention_bias=cfg.get("attention_bias", cfg.get("qkv_bias", False)),
            hidden_act=cfg.get(
                "hidden_act", cfg.get("hidden_activation", "silu")  # gemma key
            ),
            qk_norm=mt in ("qwen3", "qwen3_moe", "gemma4")
            or mt.startswith("gemma3")
            or (cfg.get("use_qk_norm", False) and not mt.startswith("llama4")),
            # llama4's "use_qk_norm" is an L2 norm (flash l2norm), not RMS
            qk_l2_norm=mt == "minimax"
            or (mt.startswith("llama4") and cfg.get("use_qk_norm", False))
            or cfg.get("qk_l2_norm", False),
            attn_temperature_tuning=bool(cfg.get("attn_temperature_tuning", False)),
            attn_floor_scale=float(cfg.get("floor_scale", 8192.0)),
            attn_scale_coef=float(cfg.get("attn_scale", 0.1)),
            norm_plus_one=mt.startswith("gemma"),
            sandwich_norms=mt.startswith("gemma") and mt != "gemma",
            embed_scale=float(hidden) ** 0.5 if mt.startswith("gemma") else 1.0,
            final_logit_softcap=cfg.get("final_logit_softcapping", 0.0) or 0.0,
            attn_logit_softcap=cfg.get("attn_logit_softcapping", 0.0) or 0.0,
            sliding_window=sw,
            sliding_window_pattern=swp,
            layer_windows=layer_windows,
            num_experts=cfg.get(
                "num_experts",
                cfg.get("num_local_experts", cfg.get("n_routed_experts", 0)),
            )
            or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0) or 0,
            shared_expert_intermediate_size=cfg.get(
                "shared_expert_intermediate_size",
                cfg.get("n_shared_experts", 0) * cfg.get("moe_intermediate_size", 0),
            )
            or 0,
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            decoder_sparse_step=cfg.get("decoder_sparse_step", 1) or 1,
            router_scoring=cfg.get("scoring_func", "softmax"),
            n_group=cfg.get("n_group", 1) or 1,
            topk_group=cfg.get("topk_group", 1) or 1,
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0) or 1.0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0) or 0,
            router_bias=cfg.get("scoring_func", "softmax") == "sigmoid",
            q_lora_rank=cfg.get("q_lora_rank", 0) or 0,
            kv_lora_rank=cfg.get("kv_lora_rank", 0) or 0,
            qk_nope_head_dim=cfg.get("qk_nope_head_dim", 0) or 0,
            qk_rope_head_dim=cfg.get("qk_rope_head_dim", 0) or 0,
            v_head_dim=cfg.get("v_head_dim", 0) or 0,
            eos_token_ids=tuple(eos),
            bos_token_id=cfg.get("bos_token_id", -1) if cfg.get("bos_token_id") is not None else -1,
            dtype=str(cfg.get("torch_dtype", "bfloat16")).replace("torch.", ""),
            extra=_hybrid_extra(cfg, mt),
        )

    @staticmethod
    def from_json_file(path: str, model_type: Optional[str] = None) -> "ModelConfig":
        with open(path) as f:
            return ModelConfig.from_hf_dict(json.load(f), model_type)


# ---------------------------------------------------------------------------
# Cache / engine configuration (reference config.rs:283-328, EngineConfig)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache geometry.

    The KV cache is one array per layer of logical shape
    [num_blocks * block_size, kv_heads, head_dim] (a flat "slot" axis that
    block tables index into); see ops/kv_cache.py. Equivalent of the
    reference's KVCacheAllocator plan (kvcache_allocator.rs:337-468).
    """

    block_size: int = 16
    num_blocks: int = 512
    # dtype of cached K/V: "bfloat16" | "int8" | "float8_e4m3fn"
    kv_dtype: str = "bfloat16"
    # blocks held by the CPU swap pool (reference block_manager.rs:876-1001)
    num_swap_blocks: int = 0
    # recurrent-state slots for hybrid GDN models (reference
    # MAMBA_CACHE_FIXED_CAPACITY, core/runner.rs:131)
    mamba_slots: int = 64
    # mamba prefix snapshots (core/hybrid_state.py; reference
    # block_manager.rs:444-550): snapshot pool capacity (0 disables prefix
    # caching for hybrids entirely) and decode capture cadence in blocks
    mamba_snapshot_slots: int = 16
    mamba_snapshot_interval_blocks: int = 4

    @property
    def num_slots(self) -> int:
        return self.block_size * self.num_blocks


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous batching limits (reference scheduler.rs:48-58, 203)."""

    max_num_seqs: int = 64
    # token budget per prefill step (reference CHUNK_SIZE, scheduler.rs:203)
    chunk_size: int = 2048
    # bucket tiers for padded prefill steps; a prefill batch is packed so
    # every row shares one tier T and rows * T stays near chunk_size
    prefill_buckets: tuple = (16, 64, 128, 256, 512, 1024, 2048)
    max_model_len: int = 8192
    # prefill/decode interleave fairness: after this many consecutive prefill
    # steps with decodes waiting, force a decode step (scheduler.rs:250-282)
    max_consecutive_prefills: int = 4
    # admission coalescing for staggered arrivals: when the engine is busy
    # and capacity trickles open one-two slots at a time (streams finish
    # one by one), each arrival would otherwise get its own tiny prefill
    # step at full dispatch cost — measured 136 prefill steps for 360
    # Poisson arrivals, prefill eating ~60% of wall at 1/9th the wave
    # bench's prefill rate. With rows > 1, prefill waits until that many
    # rows can start together, bounded by `steps` passed-over schedule()
    # rounds (COUNT-based, never wall-clock: multi-host followers replay
    # the same schedule history, so the decision stays bit-identical
    # across hosts). 1 = off (classic immediate admission).
    admission_coalesce_rows: int = 1
    admission_coalesce_steps: int = 8
    # adaptive speculative decode: the on-device propose+verify loop pays
    # a (k+1)-query attention pass per emitted-token-group, so at low
    # acceptance it runs ~0.7x plain decode (measured: 44 vs 64 tok/s on
    # the 8B at acceptance 1.0). When on, the engine watches the measured
    # acceptance (integer counters — multi-host replicas evolve the gate
    # bit-identically) and falls back to plain multi-step while it is
    # below ~1.5 (the break-even), re-probing every 8th burst. Outputs
    # are bit-identical either way (greedy-exact spec).
    spec_adaptive: bool = True
    # prefix-cache occupancy control (scheduler.rs:48-58)
    prefix_cache_enabled: bool = True
    prefix_cache_max_ratio: float = 0.8
    prefix_cache_evict_to_ratio: float = 0.5
    # KV pressure: swap out / preempt when used blocks exceed this ratio
    kv_pressure_ratio: float = 0.95
    # swap-in cooling period after a swap-out (reference
    # SWAP_COOLING_PERIOD = 5000 ms, scheduler.rs:49): prevents out/in
    # thrash at the pressure boundary
    swap_cooling_s: float = 5.0
    # on-device multi-step decode: tokens generated per engine step for
    # unguided, non-stop-string sequences (1 = classic per-token stepping)
    multi_step_decode: int = 1
    # prompt-lookup speculative decoding: draft up to k tokens per greedy
    # sequence and verify them in one forward (0 = disabled)
    spec_decode_k: int = 0
    # stream pacing: re-deliver each multi-step burst spread across the
    # next step's duration so streaming clients see ~step/k inter-token
    # gaps instead of k-token bursts with step-sized stalls (core/pacer.py;
    # throughput and the schedule itself are unchanged)
    stream_pacing: bool = False


@dataclass(frozen=True)
class EngineConfig:
    """Top-level engine configuration (reference EngineConfig, config.rs:283-328)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    # weight quantization: None | "int8" | "int4" (canonical packed formats,
    # see quant/pack.py); GGUF/GPTQ/AWQ checkpoints are converted on load.
    quant: Optional[str] = None
    # quant group size along the reduction dim
    quant_group: int = 128
    # tensor-parallel world size (mesh "model" axis)
    tp_size: int = 1
    # data-parallel size (mesh "data" axis)
    dp_size: int = 1
    # token bucket sizes for prefill steps (padded; one compile per bucket)
    prefill_buckets: tuple = (16, 64, 128, 256, 512, 1024, 2048)
    # batch buckets for decode steps
    decode_buckets: tuple = (8, 16, 32, 64)
    seed: int = 0


# ---------------------------------------------------------------------------
# Per-request sampling parameters (reference config.rs:506-537)
# ---------------------------------------------------------------------------


@dataclass
class SamplingParams:
    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0
    min_p: float = 0.0
    max_tokens: int = 1024
    repetition_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    stop: Sequence[str] = ()
    stop_token_ids: Sequence[int] = ()
    seed: Optional[int] = None
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    # guided decoding constraint (see utils/guidance.py): ("json", schema) etc.
    constraint: Optional[tuple] = None
    # structured reasoning (reference utils/reasoning.rs + server/mod.rs
    # normalize_reasoning_controls): effort level none/low/medium/high/
    # chain_of_thought; budget is a char budget override (Claude
    # thinking.budget_tokens maps here); think_markers is the (start, end)
    # marker pair — the server sets it from tokenizer discovery and clears
    # reasoning_effort when the tokenizer exposes no reasoning tokens
    reasoning_effort: Optional[str] = None
    reasoning_budget: Optional[int] = None
    think_markers: Optional[tuple] = None
    # include stop string in output
    include_stop_str_in_output: bool = False

    def greedy(self) -> bool:
        return self.temperature <= 1e-5

    @staticmethod
    def from_dict(d: dict) -> "SamplingParams":
        names = {f.name for f in dataclasses.fields(SamplingParams)}
        sp = SamplingParams(**{k: v for k, v in d.items() if k in names})
        # JSON round-trips (the multi-host request feed) turn tuples into
        # lists; normalize back so equality and hashing behave
        sp.stop = tuple(sp.stop or ())
        sp.stop_token_ids = tuple(sp.stop_token_ids or ())
        if sp.constraint is not None:
            kind, arg = sp.constraint
            if isinstance(arg, list):
                arg = tuple(arg)
            sp.constraint = (kind, arg)
        if sp.think_markers is not None:
            sp.think_markers = tuple(sp.think_markers)
        return sp

    def to_dict(self) -> dict:
        """JSON-safe dict (multi-host feed wire format; inverse of
        from_dict up to tuple/list normalization)."""
        d = dataclasses.asdict(self)
        d["stop"] = list(self.stop or ())
        d["stop_token_ids"] = list(self.stop_token_ids or ())
        if self.constraint is not None:
            kind, arg = self.constraint
            if isinstance(arg, tuple):
                arg = list(arg)
            d["constraint"] = [kind, arg]
        if self.think_markers is not None:
            d["think_markers"] = list(self.think_markers)
        return d


# ---------------------------------------------------------------------------
# KV memory planning (reference kvcache_allocator.rs:337-612)
# ---------------------------------------------------------------------------

_KV_BYTES = {"bfloat16": 2, "float16": 2, "int8": 1, "float8_e4m3fn": 1}


def plan_kv_cache(
    model: ModelConfig,
    *,
    hbm_bytes_free: int,
    block_size: int = 16,
    kv_dtype: str = "bfloat16",
    reserve_fraction: float = 0.10,
    max_num_blocks: int = 0,
    tp_size: int = 1,
) -> CacheConfig:
    """Size the block pool from free device memory.

    The reference allocates *all* remaining memory as KV blocks after model
    weights, treating scheduler limits as soft (kvcache_allocator.rs:652-668).
    We do the same minus a reserve fraction for XLA scratch.
    """
    kv_heads_local = max(1, model.num_key_value_heads // max(tp_size, 1))
    bytes_per_slot = 2 * kv_heads_local * model.head_dim_ * _KV_BYTES[kv_dtype]
    bytes_per_block = bytes_per_slot * block_size * model.num_hidden_layers
    usable = int(hbm_bytes_free * (1.0 - reserve_fraction))
    num_blocks = max(usable // bytes_per_block, 16)
    if max_num_blocks:
        num_blocks = min(num_blocks, max_num_blocks)
    return CacheConfig(block_size=block_size, num_blocks=int(num_blocks), kv_dtype=kv_dtype)
