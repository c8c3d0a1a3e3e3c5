"""Checkpoint loading: HF safetensors → model parameter pytrees.

Counterpart of the reference's VarBuilderX + per-model weight loading
(src/models/layers/mod.rs:34-152 and each model's `new`), restructured for
the stacked-layer pytree layout the TPU models use: every per-layer HF
tensor `model.layers.{i}.<submodule>` is transposed to [K, N] (jnp
convention: y = x @ W), optionally quantized on load (the ISQ analog,
reference linear.rs:352-399), and stacked along a leading layer axis so the
trunk runs under lax.scan.

Loading is streaming: one tensor at a time from safetensors shards, so peak
host memory is ~one layer, not the checkpoint.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import Linear
from vllm_rs_tpu.quant.pack import quantize_param

logger = logging.getLogger(__name__)


class SafetensorsDir:
    """Random access over all *.safetensors shards in a directory."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._handles = {}
        self._index: Dict[str, str] = {}
        paths = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
        if not paths:
            raise FileNotFoundError(f"no .safetensors in {model_dir}")
        for p in paths:
            h = safe_open(p, framework="flax")
            self._handles[p] = h
            for k in h.keys():
                self._index[k] = p

    def keys(self):
        return self._index.keys()

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def get(self, key: str) -> jax.Array:
        return self._handles[self._index[key]].get_tensor(key)


def detect_checkpoint_fp4(st) -> Optional[str]:
    """Return "mxfp4"/"nvfp4" when the checkpoint stores packed-FP4 linears
    (reference LnMxfp4/LnNvfp4, linear.rs:1080-1306), else None.

    Markers: nibble blocks under `.weight_packed`/`.blocks`, or a uint8
    `.weight` next to `.weight_scale`; nvfp4 additionally carries a global
    scale (`.weight_scale_2` modelopt / `.weight_global_scale` ct) or per-16
    E4M3 block scales (vs mxfp4's per-32 E8M0).

    Both the packed tensor and the scales are validated before a format is
    returned: FP4 nibbles pack into uint8 (compressed-tensors pack-quantized
    INT4 also ships `weight_packed`+`weight_scale` but packs into int32 and
    uses fp16/bf16 group scales — it must NOT classify as FP4; advisor r3
    finding), and the scale granularity must be the format's block size
    (per-32 E8M0-as-uint8 → mxfp4, per-16 E4M3 → nvfp4)."""

    def classify(base):
        packed = None
        for bkey in (".weight_packed", ".blocks", ".weight"):
            if base + bkey in st:
                packed = st.get(base + bkey)
                break
        if packed is None or packed.dtype != jnp.uint8:
            return None  # int32-packed = compressed-tensors INT4, not FP4
        scales = None
        for skey in (".weight_scale", ".scales"):
            if base + skey in st:
                scales = st.get(base + skey)
                break
        if scales is None or scales.ndim < 2:
            return None
        K = packed.shape[-1] * 2  # two nibbles per byte
        sdt = str(scales.dtype)
        if scales.shape[-1] * 32 == K and scales.dtype == jnp.uint8:
            return "mxfp4"  # E8M0 exponents stored as uint8, per-32 blocks
        has_global = (
            base + ".weight_scale_2" in st or base + ".weight_global_scale" in st
        )
        if scales.shape[-1] * 16 == K and ("e4m3" in sdt or has_global):
            return "nvfp4"
        return None

    seen = set()
    for k in st.keys():
        base = None
        for suffix in (".weight_packed", ".blocks", ".weight_scale", ".scales"):
            if k.endswith(suffix):
                base = k[: -len(suffix)]
                break
        if base is None or base in seen:
            continue
        seen.add(base)
        fmt = classify(base)
        if fmt is not None:
            return fmt
    return None


def resolve_auto_quant(st, quant: Optional[str], quant_group: int):
    """Resolve quant="auto" (the default): FP4 checkpoints requantize to
    packed int4 on load so weights STREAM at ~4 bit — without this, an
    NVFP4 checkpoint materializes at 4x its bytes and decodes at bf16
    bandwidth, defeating the format's entire point (reference keeps FP4
    packed end-to-end in its LnMxfp4/LnNvfp4 GEMMs, linear.rs:1080-1306;
    TPU has no FP4 datapath, so canonical int4 is the streaming form).
    `--quant none` is the explicit escape hatch to bf16 materialization.

    Group size stays at the caller's (default 128) rather than the fp4
    block size (16/32): the fused kernels do one MXU dot per group, and a
    depth-16 dot uses 1/8 of the 128-deep systolic pass — group=16 would
    cost 8x the MXU passes of group=128 exactly where batch-1 decode is
    MXU-pass-bound (PERF_NOTES.md roofline). The requantization error vs
    native FP4 is the price of streaming on this hardware; use
    --quant-group 32 to trade decode speed for per-block fidelity."""
    if quant == "none":
        return None, quant_group
    if quant != "auto":
        return quant, quant_group
    fmt = detect_checkpoint_fp4(st)
    if fmt is None:
        return None, quant_group
    logger.info(
        "auto-ISQ: %s checkpoint requantized to int4 (group %d) so weights "
        "stream at 4-bit; pass --quant none to materialize bf16 instead",
        fmt, quant_group,
    )
    return "int4", quant_group


def _maybe_quant(w: jax.Array, quant: Optional[str], group: int):
    if quant is None or w.ndim != 2:
        return w
    K = w.shape[0]
    if K % group != 0 or (quant == "int4" and K % (2 * group)):
        return w  # indivisible → keep unquantized (reference Q8_0 fallback)
    return quantize_param(w, quant, group)


def _stack(leaves: List):
    """Stack a list of per-layer pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *leaves)


class _Loader:
    def __init__(
        self,
        st: SafetensorsDir,
        config: ModelConfig,
        quant: Optional[str],
        quant_group: int,
        dtype=jnp.bfloat16,
    ):
        self.st = st
        self.cfg = config
        self.quant = quant
        self.group = quant_group
        self.dtype = dtype
        # text-trunk prefix: VL checkpoints nest the LM under language_model
        self.pre = "model"
        for cand in ("model", "model.language_model", "language_model.model"):
            if f"{cand}.embed_tokens.weight" in st:
                self.pre = cand
                break

    def t(self, key: str) -> jax.Array:
        """Raw tensor in compute dtype."""
        return self.st.get(key).astype(self.dtype)

    def lin(self, prefix: str, quantize: bool = True) -> object:
        """HF `<prefix>.weight` [N, K] (+ optional bias) → our [K, N] linear.

        GPTQ/AWQ checkpoints store `<prefix>.qweight/qzeros/scales[/g_idx]`
        instead; those convert through quant/wna16.py.
        """
        if prefix + ".qweight" in self.st:
            w = self._wna16(prefix)
        elif prefix + ".weight_scale_inv" in self.st:
            w = self._fp8(prefix)
        elif self._is_fp4(prefix):
            w = self._fp4(prefix)
            w = _maybe_quant(w, self.quant if quantize else None, self.group)
        else:
            w = self.t(prefix + ".weight").T
            w = _maybe_quant(w, self.quant if quantize else None, self.group)
        bkey = prefix + ".bias"
        if bkey in self.st:
            return Linear(w, self.t(bkey))
        return w

    def _fp8(self, prefix: str) -> object:
        """DeepSeek-style blockwise FP8: weight f8e4m3 [N, K] +
        weight_scale_inv f32 [N/Bn, K/Bk] → transposed Fp8BlockTensor."""
        from vllm_rs_tpu.quant.fp8 import Fp8BlockTensor

        w = self.st.get(prefix + ".weight")  # [N, K] f8
        s = self.st.get(prefix + ".weight_scale_inv").astype(jnp.float32)
        N, K = w.shape
        Bk = K // s.shape[1]
        Bn = N // s.shape[0]
        return Fp8BlockTensor(w.T, s.T, (Bk, Bn))

    def _is_fp4(self, prefix: str) -> bool:
        """MXFP4/NVFP4 packed checkpoints (reference linear.rs:1087-1189):
        u8 nibble blocks under weight_packed/blocks/weight + a u8 scale
        tensor (E8M0 per 32 → mxfp4; E4M3 per 16 → nvfp4)."""
        if prefix + ".weight_packed" in self.st or prefix + ".blocks" in self.st:
            return True
        if prefix + ".weight" in self.st and prefix + ".weight_scale" in self.st:
            return self.st.get(prefix + ".weight").dtype == jnp.uint8
        return False

    def _fp4(self, prefix: str) -> jax.Array:
        """Decode packed FP4 → bf16 [K, N]. E2M1 x power-of-two (or E4M3)
        scales are exactly representable in bf16, so this is lossless;
        downstream `_maybe_quant` provides the ISQ path to int4/int8."""
        from vllm_rs_tpu.quant.fp4 import mxfp4_dequant, nvfp4_dequant

        for bkey in (".weight_packed", ".blocks", ".weight"):
            if prefix + bkey in self.st:
                blocks = np.asarray(self.st.get(prefix + bkey))
                break
        for skey in (".weight_scale", ".scales"):
            if prefix + skey in self.st:
                scales = np.asarray(self.st.get(prefix + skey))
                break
        K = blocks.shape[-1] * 2
        gs = None
        if prefix + ".weight_scale_2" in self.st:  # modelopt: direct multiplier
            gs = float(np.asarray(self.st.get(prefix + ".weight_scale_2")).reshape(-1)[0])
        elif prefix + ".weight_global_scale" in self.st:  # ct: divisor
            raw = float(
                np.asarray(self.st.get(prefix + ".weight_global_scale")).reshape(-1)[0]
            )
            gs = 1.0 / raw if raw != 0.0 else 1.0
        if gs is None and scales.shape[-1] * 32 == K:
            w = mxfp4_dequant(blocks, scales)
        else:
            w = nvfp4_dequant(blocks, scales, gs if gs is not None else 1.0)
        return jnp.asarray(w.T, dtype=self.dtype)

    def _wna16(self, prefix: str) -> object:
        from vllm_rs_tpu.quant.wna16 import awq_to_canonical, gptq_to_canonical

        qweight = np.asarray(self.st.get(prefix + ".qweight"))
        qzeros = np.asarray(self.st.get(prefix + ".qzeros"))
        scales = np.asarray(
            self.st.get(prefix + ".scales").astype(jnp.float32)
        )
        N = scales.shape[1]
        if qweight.shape[1] == N:  # GPTQ packs along K
            g_idx = None
            if prefix + ".g_idx" in self.st:
                g_idx = np.asarray(self.st.get(prefix + ".g_idx"))
            return gptq_to_canonical(qweight, qzeros, scales, g_idx, bits=4)
        return awq_to_canonical(qweight, qzeros, scales)

    def norm(self, key: str) -> jax.Array:
        return self.t(key + ".weight")


# ---------------------------------------------------------------------------
# per-family layer converters: (loader, hf layer prefix) → our layer dict
# ---------------------------------------------------------------------------


def _fuse_n(*ws):
    """Concatenate linear weights along N (merged projections,
    reference MergedParallelColumnLinear) — None when layouts differ."""
    from vllm_rs_tpu.quant.fp8 import Fp8BlockTensor
    from vllm_rs_tpu.quant.pack import PackedInt4Tensor, QuantizedTensor

    kinds = {type(w) for w in ws}
    if len(kinds) != 1 or Linear in kinds or Fp8BlockTensor in kinds:
        return None
    k = kinds.pop()
    if k in (QuantizedTensor, PackedInt4Tensor):
        groups = {w.group_size for w in ws}
        if len(groups) != 1:
            return None
        zeros = None
        if all(w.zeros is not None for w in ws):
            zeros = jnp.concatenate([w.zeros for w in ws], axis=1)
        elif any(w.zeros is not None for w in ws):
            return None
        return k(
            jnp.concatenate([w.qweight for w in ws], axis=1),
            jnp.concatenate([w.scales for w in ws], axis=1),
            zeros,
        )
    return jnp.concatenate(ws, axis=1)


def _attn_common(ld: _Loader, p: str) -> dict:
    from vllm_rs_tpu.ops.rope import rope_inv_freq

    cfg = ld.cfg
    d = {
        "input_ln": ld.norm(f"{p}.input_layernorm"),
        "post_ln": ld.norm(f"{p}.post_attention_layernorm"),
        "q": ld.lin(f"{p}.self_attn.q_proj"),
        "k": ld.lin(f"{p}.self_attn.k_proj"),
        "v": ld.lin(f"{p}.self_attn.v_proj"),
        "o": ld.lin(f"{p}.self_attn.o_proj"),
        "inv_freq": rope_inv_freq(cfg),
    }
    if cfg.sandwich_norms:  # gemma2/3 pre/post feedforward norms
        d["pre_ffw_ln"] = ld.norm(f"{p}.pre_feedforward_layernorm")
        d["post_ffw_ln"] = ld.norm(f"{p}.post_feedforward_layernorm")
    fused = _fuse_n(d["q"], d["k"], d["v"])
    if fused is not None:
        d["qkv"] = fused
        del d["q"], d["k"], d["v"]
    if cfg.qk_norm:
        d["q_norm"] = ld.norm(f"{p}.self_attn.q_norm")
        d["k_norm"] = ld.norm(f"{p}.self_attn.k_norm")
    if cfg.layer_windows:
        i = int(p.rsplit(".", 1)[1])
        d["window"] = jnp.asarray(cfg.layer_windows[i], dtype=jnp.int32)
    return d


def _dense_layer(ld: _Loader, i: int) -> dict:
    p = f"{ld.pre}.layers.{i}"
    d = _attn_common(ld, p)
    gate = ld.lin(f"{p}.mlp.gate_proj")
    up = ld.lin(f"{p}.mlp.up_proj")
    d["down"] = ld.lin(f"{p}.mlp.down_proj")
    fused = _fuse_n(gate, up)
    if fused is not None:
        d["gate_up"] = fused
    else:
        d["gate"], d["up"] = gate, up
    return d


def _moe_experts(ld: _Loader, p: str) -> dict:
    cfg = ld.cfg
    E = cfg.num_experts
    wg, wu, wd = [], [], []
    for e in range(E):
        ep = f"{p}.mlp.experts.{e}"
        wg.append(ld.lin(f"{ep}.gate_proj"))
        wu.append(ld.lin(f"{ep}.up_proj"))
        wd.append(ld.lin(f"{ep}.down_proj"))
    d = {"w_gate": _stack(wg), "w_up": _stack(wu), "w_down": _stack(wd)}
    return _moe_router_shared(ld, p, d)


def _moe_experts_stacked(ld: _Loader, p: str) -> dict:
    """GGUF-style stacked expert tensors `mlp.experts.{gate,up,down}_proj`
    of shape [E, out, in] → quantized [E, in, out] stacks."""
    d = {}
    for ours, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj"), ("w_down", "down_proj")):
        w = ld.t(f"{p}.mlp.experts.{hf}.weight")  # [E, N, K]
        w = jnp.swapaxes(w, 1, 2)  # [E, K, N]
        if ld.quant is not None and w.shape[1] % ld.group == 0:
            w = jax.vmap(lambda x: quantize_param(x, ld.quant, ld.group))(w)
        d[ours] = w
    return _moe_router_shared(ld, p, d)


def _moe_router_shared(ld: _Loader, p: str, d: dict) -> dict:
    # router (HF: mlp.gate) stays high precision
    d["router"] = ld.lin(f"{p}.mlp.gate", quantize=False)
    bias_key = f"{p}.mlp.gate.e_score_correction_bias"
    if bias_key in ld.st:
        d["router_bias"] = ld.st.get(bias_key).astype(jnp.float32)
    # shared expert: qwen2-moe name or deepseek name
    for name in ("shared_expert", "shared_experts"):
        if f"{p}.mlp.{name}.gate_proj.weight" in ld.st:
            d["shared_gate_proj"] = ld.lin(f"{p}.mlp.{name}.gate_proj")
            d["shared_up_proj"] = ld.lin(f"{p}.mlp.{name}.up_proj")
            d["shared_down_proj"] = ld.lin(f"{p}.mlp.{name}.down_proj")
    if f"{p}.mlp.shared_expert_gate.weight" in ld.st:
        d["shared_gate"] = ld.lin(f"{p}.mlp.shared_expert_gate", quantize=False)
    return d


def _moe_layer(ld: _Loader, i: int) -> dict:
    p = f"{ld.pre}.layers.{i}"
    d = _attn_common(ld, p)
    if f"{p}.mlp.experts.gate_proj.weight" in ld.st:  # GGUF stacked layout
        d.update(_moe_experts_stacked(ld, p))
    else:
        d.update(_moe_experts(ld, p))
    return d


def _mla_attn(ld: _Loader, p: str) -> dict:
    """DeepSeek MLA projections, with kv_b split into absorbed factors."""
    import dataclasses

    from vllm_rs_tpu.ops.rope import rope_inv_freq

    cfg = ld.cfg
    H = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    d = {
        "input_ln": ld.norm(f"{p}.input_layernorm"),
        "post_ln": ld.norm(f"{p}.post_attention_layernorm"),
        "kv_a": ld.lin(f"{p}.self_attn.kv_a_proj_with_mqa", quantize=False),
        "kv_a_norm": ld.norm(f"{p}.self_attn.kv_a_layernorm"),
        "o": ld.lin(f"{p}.self_attn.o_proj"),
        "inv_freq": rope_inv_freq(
            dataclasses.replace(cfg, head_dim=dr, partial_rotary_factor=1.0)
        ),
    }
    # kv_b.weight: [H*(dn+dv), R] out-first → [H, dn+dv, R]
    kv_b = ld.t(f"{p}.self_attn.kv_b_proj.weight")
    R = kv_b.shape[1]
    kv_b = kv_b.reshape(H, dn + dv, R)
    d["w_uk"] = kv_b[:, :dn, :]  # [H, dn, R]
    d["w_uv"] = jnp.swapaxes(kv_b[:, dn:, :], 1, 2)  # [H, R, dv]
    if cfg.q_lora_rank:
        d["q_a"] = ld.lin(f"{p}.self_attn.q_a_proj", quantize=False)
        d["q_a_norm"] = ld.norm(f"{p}.self_attn.q_a_layernorm")
        d["q_b"] = ld.lin(f"{p}.self_attn.q_b_proj")
    else:
        d["q"] = ld.lin(f"{p}.self_attn.q_proj")
    return d


def _mla_dense_layer(ld: _Loader, i: int) -> dict:
    p = f"{ld.pre}.layers.{i}"
    d = _mla_attn(ld, p)
    d.update(
        {
            "gate": ld.lin(f"{p}.mlp.gate_proj"),
            "up": ld.lin(f"{p}.mlp.up_proj"),
            "down": ld.lin(f"{p}.mlp.down_proj"),
        }
    )
    return d


def _mla_moe_layer(ld: _Loader, i: int) -> dict:
    p = f"{ld.pre}.layers.{i}"
    d = _mla_attn(ld, p)
    d.update(_moe_experts(ld, p))
    return d


def _gemma4_layer(ld: _Loader, model, p: str, i: int, full: bool) -> dict:
    """One gemma4 decoder layer (gemma4.rs:178-555): heterogeneous attention
    geometry, sandwich + MoE norms, layer_scalar, per-layer-input gate."""
    from vllm_rs_tpu.ops.rope import rope_inv_freq
    import dataclasses

    cfg = ld.cfg
    inv_g = rope_inv_freq(
        dataclasses.replace(cfg, head_dim=model.D_g, partial_rotary_factor=1.0)
    )[: model.rot_g // 2]
    inv_s = rope_inv_freq(
        dataclasses.replace(
            cfg,
            head_dim=model.D_s,
            rope_theta=model.local_theta,
            rope_scaling=None,
            partial_rotary_factor=1.0,
        )
    )
    d = {
        "input_ln": ld.norm(f"{p}.input_layernorm"),
        "post_ln": ld.norm(f"{p}.post_attention_layernorm"),
        "pre_ffw_ln": ld.norm(f"{p}.pre_feedforward_layernorm"),
        "post_ffw_ln": ld.norm(f"{p}.post_feedforward_layernorm"),
        "q": ld.lin(f"{p}.self_attn.q_proj"),
        "k": ld.lin(f"{p}.self_attn.k_proj"),
        "o": ld.lin(f"{p}.self_attn.o_proj"),
        "down": ld.lin(f"{p}.mlp.down_proj"),
        "inv_freq": inv_g if full else inv_s,
    }
    # global layers with attention_k_eq_v share k/v weights (attention.rs:205-214)
    if full and model.k_eq_v and f"{p}.self_attn.v_proj.weight" not in ld.st:
        d["v"] = d["k"]
    else:
        d["v"] = ld.lin(f"{p}.self_attn.v_proj")
    gate = ld.lin(f"{p}.mlp.gate_proj")
    up = ld.lin(f"{p}.mlp.up_proj")
    fused = _fuse_n(gate, up)
    if fused is not None:
        d["gate_up"] = fused
    else:
        d["gate"], d["up"] = gate, up
    if cfg.qk_norm:
        d["q_norm"] = ld.norm(f"{p}.self_attn.q_norm")
        d["k_norm"] = ld.norm(f"{p}.self_attn.k_norm")
    if f"{p}.layer_scalar" in ld.st:
        d["layer_scalar"] = ld.st.get(f"{p}.layer_scalar").astype(jnp.float32)
    else:
        d["layer_scalar"] = jnp.ones((1,), dtype=jnp.float32)
    if model.is_moe:
        d["router_scale"] = ld.st.get(f"{p}.router.scale").astype(jnp.float32)
        d["router_proj"] = ld.lin(f"{p}.router.proj", quantize=False)
        d["per_expert_scale"] = ld.st.get(f"{p}.router.per_expert_scale").astype(
            jnp.float32
        )
        if f"{p}.experts.gate_proj.weight" in ld.st:  # stacked layout
            for ours, hf in (
                ("w_gate", "gate_proj"), ("w_up", "up_proj"), ("w_down", "down_proj"),
            ):
                w = jnp.swapaxes(ld.t(f"{p}.experts.{hf}.weight"), 1, 2)
                if ld.quant is not None and w.shape[1] % ld.group == 0:
                    w = jax.vmap(lambda x: quantize_param(x, ld.quant, ld.group))(w)
                d[ours] = w
        else:
            wg, wu, wd = [], [], []
            for e in range(cfg.num_experts):
                ep = f"{p}.experts.{e}"
                wg.append(ld.lin(f"{ep}.gate_proj"))
                wu.append(ld.lin(f"{ep}.up_proj"))
                wd.append(ld.lin(f"{ep}.down_proj"))
            d["w_gate"], d["w_up"], d["w_down"] = _stack(wg), _stack(wu), _stack(wd)
        d["post_ffw_ln_1"] = ld.norm(f"{p}.post_feedforward_layernorm_1")
        d["post_ffw_ln_2"] = ld.norm(f"{p}.post_feedforward_layernorm_2")
        d["pre_ffw_ln_2"] = ld.norm(f"{p}.pre_feedforward_layernorm_2")
    if model.pli_dim:
        d["pli_gate"] = ld.lin(f"{p}.per_layer_input_gate", quantize=False)
        d["pli_proj"] = ld.lin(f"{p}.per_layer_projection", quantize=False)
        d["post_pli_norm"] = ld.norm(f"{p}.post_per_layer_input_norm")
    return d


def _load_gemma4(ld: _Loader, config: ModelConfig, dtype) -> dict:
    """Gemma4 checkpoints keep a per-layer list (heterogeneous shapes)."""
    from vllm_rs_tpu.models.gemma4 import Gemma4ForCausalLM

    model = Gemma4ForCausalLM(config)
    # multimodal checkpoints nest under language_model (gemma4.rs lm_prefix)
    pre = "model"
    if f"{pre}.embed_tokens.weight" not in ld.st:
        pre = "language_model.model"
    params: dict = {
        "embed": ld.t(f"{pre}.embed_tokens.weight"),
        "final_norm": ld.norm(f"{pre}.norm"),
        "layers": [
            _gemma4_layer(ld, model, f"{pre}.layers.{i}", i, t == "full")
            for i, t in enumerate(model.layer_types)
        ],
    }
    if model.pli_dim and f"{pre}.embed_tokens_per_layer.weight" in ld.st:
        params["embed_per_layer"] = ld.t(f"{pre}.embed_tokens_per_layer.weight")
        params["pli_model_proj"] = ld.lin(
            f"{pre}.per_layer_model_projection", quantize=False
        )
        params["pli_proj_norm"] = ld.norm(f"{pre}.per_layer_projection_norm")
    if not config.tie_word_embeddings and "lm_head.weight" in ld.st:
        head = ld.st.get("lm_head.weight").astype(dtype).T
        params["lm_head"] = _maybe_quant(
            head, "int8" if ld.quant is not None else None, head.shape[0]
        )
    return params


def _load_llama4(ld: _Loader, config: ModelConfig, dtype) -> dict:
    """Llama4 checkpoints (HF Llama4ForConditionalGeneration): per-layer
    list with interleaved dense/MoE feed_forwards, stacked expert tensors
    `feed_forward.experts.{gate_up_proj,down_proj}` (bare parameters, no
    .weight suffix), vision under vision_model + multi_modal_projector."""
    from vllm_rs_tpu.models.llama4 import Llama4ForCausalLM
    from vllm_rs_tpu.ops.rope import rope_inv_freq

    cfg = config
    model = Llama4ForCausalLM(cfg)
    pre = ld.pre
    st = ld.st
    inv = rope_inv_freq(cfg)
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pre}.layers.{i}"
        d = {
            "input_ln": ld.norm(f"{p}.input_layernorm"),
            "post_ln": ld.norm(f"{p}.post_attention_layernorm"),
            "o": ld.lin(f"{p}.self_attn.o_proj"),
            "inv_freq": inv,
        }
        q = ld.lin(f"{p}.self_attn.q_proj")
        k = ld.lin(f"{p}.self_attn.k_proj")
        v = ld.lin(f"{p}.self_attn.v_proj")
        fused = _fuse_n(q, k, v)
        if fused is not None:
            d["qkv"] = fused
        else:
            d["q"], d["k"], d["v"] = q, k, v
        ff = f"{p}.feed_forward"
        if f"{ff}.router.weight" in st:  # MoE layer
            d["router"] = ld.lin(f"{ff}.router", quantize=False)
            gu = ld.t(f"{ff}.experts.gate_up_proj")  # [E, D, 2I] stacked
            I = gu.shape[-1] // 2
            wg, wu = gu[..., :I], gu[..., I:]
            wd = ld.t(f"{ff}.experts.down_proj")  # [E, I, D]
            if ld.quant is not None and wg.shape[1] % ld.group == 0:
                qz = lambda w: jax.vmap(  # noqa: E731
                    lambda x: quantize_param(x, ld.quant, ld.group)
                )(w)
                wg, wu, wd = qz(wg), qz(wu), qz(wd)
            d["w_gate"], d["w_up"], d["w_down"] = wg, wu, wd
            sg = ld.lin(f"{ff}.shared_expert.gate_proj")
            su = ld.lin(f"{ff}.shared_expert.up_proj")
            fused = _fuse_n(sg, su)
            if fused is not None:
                d["shared_gate_up"] = fused
            else:
                d["shared_gate"], d["shared_up"] = sg, su
            d["shared_down"] = ld.lin(f"{ff}.shared_expert.down_proj")
        else:  # dense layer
            g = ld.lin(f"{ff}.gate_proj")
            u = ld.lin(f"{ff}.up_proj")
            fused = _fuse_n(g, u)
            if fused is not None:
                d["gate_up"] = fused
            else:
                d["gate"], d["up"] = g, u
            d["down"] = ld.lin(f"{ff}.down_proj")
        layers.append(d)
    params: dict = {
        "embed": ld.t(f"{pre}.embed_tokens.weight"),
        "final_norm": ld.norm(f"{pre}.norm"),
        "layers": layers,
    }
    for head_key in ("lm_head.weight", "language_model.lm_head.weight"):
        if not cfg.tie_word_embeddings and head_key in st:
            head = st.get(head_key).astype(dtype).T
            params["lm_head"] = _maybe_quant(
                head, "int8" if ld.quant is not None else None, head.shape[0]
            )
            break

    # vision (llama4/vision.rs names)
    vp = None
    for cand in ("vision_model", "model.vision_model"):
        if f"{cand}.class_embedding" in st:
            vp = cand
            break
    if vp is not None and model.has_vision:
        dt = ld.dtype

        def t(key):
            return st.get(key).astype(dt)

        def lin(prefix):
            w = t(f"{prefix}.weight").T
            b = t(f"{prefix}.bias") if f"{prefix}.bias" in st else None
            return w, b

        vision: dict = {
            "patch_embed": t(f"{vp}.patch_embedding.linear.weight").T,
            "class_embedding": t(f"{vp}.class_embedding"),
            "pos_embed": t(f"{vp}.positional_embedding_vlm"),
            "ln_pre_w": t(f"{vp}.layernorm_pre.weight"),
            "ln_pre_b": t(f"{vp}.layernorm_pre.bias"),
            "ln_post_w": t(f"{vp}.layernorm_post.weight"),
            "ln_post_b": t(f"{vp}.layernorm_post.bias"),
            "adapter_fc1": t(f"{vp}.vision_adapter.mlp.fc1.weight").T,
            "adapter_fc2": t(f"{vp}.vision_adapter.mlp.fc2.weight").T,
        }
        blocks: List[dict] = []
        i = 0
        while f"{vp}.model.layers.{i}.input_layernorm.weight" in st:
            p = f"{vp}.model.layers.{i}"
            b = {
                "ln1_w": t(f"{p}.input_layernorm.weight"),
                "ln1_b": t(f"{p}.input_layernorm.bias"),
                "ln2_w": t(f"{p}.post_attention_layernorm.weight"),
                "ln2_b": t(f"{p}.post_attention_layernorm.bias"),
            }
            for ours, hf in (
                ("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj"),
            ):
                b[ours], b[f"{ours}_b"] = lin(f"{p}.self_attn.{hf}")
            b["fc1"], b["fc1_b"] = lin(f"{p}.mlp.fc1")
            b["fc2"], b["fc2_b"] = lin(f"{p}.mlp.fc2")
            blocks.append(b)
            i += 1
        vision["blocks"] = _stack(
            [{k2: v2 for k2, v2 in b.items() if v2 is not None} for b in blocks]
        )
        params["vision"] = vision
        mp = "multi_modal_projector"
        if f"model.{mp}.linear_1.weight" in st:
            mp = f"model.{mp}"
        params["mm_proj"] = t(f"{mp}.linear_1.weight").T
    return params


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def _load_siglip(ld: _Loader) -> Optional[dict]:
    """Gemma3 SigLIP vision (reference gemma3/mod.rs:30-125):
    vision_tower.vision_model.{embeddings,encoder.layers.N,post_layernorm}
    + multi_modal_projector.{mm_input_projection_weight,mm_soft_emb_norm}.
    Returns {"vision": ..., "mm_proj": ..., "mm_norm": ...} or None."""
    st = ld.st
    vp = None
    for cand in ("vision_tower.vision_model", "model.vision_tower.vision_model"):
        if f"{cand}.embeddings.patch_embedding.weight" in st:
            vp = cand
            break
    if vp is None:
        return None
    dt = ld.dtype

    def t(key):
        return st.get(key).astype(dt)

    def lin(prefix):
        w = t(f"{prefix}.weight").T
        b = t(f"{prefix}.bias") if f"{prefix}.bias" in st else None
        return w, b

    conv = st.get(f"{vp}.embeddings.patch_embedding.weight").astype(jnp.float32)
    W = conv.shape[0]  # [W, 3, ps, ps] conv2d
    vision: dict = {
        "patch_embed": conv.reshape(W, -1).T.astype(dt),
        "patch_embed_b": t(f"{vp}.embeddings.patch_embedding.bias"),
        "pos_embed": t(f"{vp}.embeddings.position_embedding.weight"),
        "post_ln_w": t(f"{vp}.post_layernorm.weight"),
        "post_ln_b": t(f"{vp}.post_layernorm.bias"),
    }
    blocks: List[dict] = []
    i = 0
    while f"{vp}.encoder.layers.{i}.layer_norm1.weight" in st:
        p = f"{vp}.encoder.layers.{i}"
        b = {
            "ln1_w": t(f"{p}.layer_norm1.weight"),
            "ln1_b": t(f"{p}.layer_norm1.bias"),
            "ln2_w": t(f"{p}.layer_norm2.weight"),
            "ln2_b": t(f"{p}.layer_norm2.bias"),
        }
        for ours, hf in (
            ("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj"),
        ):
            b[ours], b[f"{ours}_b"] = lin(f"{p}.self_attn.{hf}")
        b["fc1"], b["fc1_b"] = lin(f"{p}.mlp.fc1")
        b["fc2"], b["fc2_b"] = lin(f"{p}.mlp.fc2")
        blocks.append(b)
        i += 1
    vision["blocks"] = _stack(
        [{k: v for k, v in b.items() if v is not None} for b in blocks]
    )
    mp = "multi_modal_projector"
    if f"model.{mp}.mm_input_projection_weight" in st:
        mp = f"model.{mp}"
    return {
        "vision": vision,
        "mm_proj": t(f"{mp}.mm_input_projection_weight"),  # [W, D_text]
        "mm_norm": t(f"{mp}.mm_soft_emb_norm.weight"),
    }


def _load_pixtral(ld: _Loader) -> Optional[dict]:
    """Mistral3/Pixtral vision (reference mistral3_vl/vision.rs + mod.rs):
    vision_tower.{patch_conv,ln_pre,transformer.layers.N} +
    multi_modal_projector.{norm,patch_merger.merging_layer,linear_1,linear_2}.
    Returns model-level params {"vision", "mm_norm", "mm_merge", ...}."""
    st = ld.st
    vp = None
    for cand in ("vision_tower", "model.vision_tower"):
        if f"{cand}.patch_conv.weight" in st:
            vp = cand
            break
    if vp is None:
        return None
    dt = ld.dtype

    def t(key):
        return st.get(key).astype(dt)

    conv = st.get(f"{vp}.patch_conv.weight").astype(jnp.float32)
    W = conv.shape[0]
    vision: dict = {
        "patch_embed": conv.reshape(W, -1).T.astype(dt),
        "ln_pre": t(f"{vp}.ln_pre.weight"),
    }
    blocks: List[dict] = []
    i = 0
    while f"{vp}.transformer.layers.{i}.attention_norm.weight" in st:
        p = f"{vp}.transformer.layers.{i}"
        b = {
            "attn_ln": t(f"{p}.attention_norm.weight"),
            "ffn_ln": t(f"{p}.ffn_norm.weight"),
        }
        for ours, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
            b[ours] = t(f"{p}.attention.{hf}.weight").T
        for ours, hf in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            b[ours] = t(f"{p}.feed_forward.{hf}.weight").T
        blocks.append(b)
        i += 1
    vision["blocks"] = _stack(blocks)
    mp = "multi_modal_projector"
    if f"model.{mp}.norm.weight" in st:
        mp = f"model.{mp}"
    out = {
        "vision": vision,
        "mm_norm": t(f"{mp}.norm.weight"),
        "mm_merge": t(f"{mp}.patch_merger.merging_layer.weight").T,
        "mm_fc1": t(f"{mp}.linear_1.weight").T,
        "mm_fc2": t(f"{mp}.linear_2.weight").T,
    }
    for ours, hf in (("mm_fc1_b", "linear_1.bias"), ("mm_fc2_b", "linear_2.bias")):
        if f"{mp}.{hf}" in st:
            out[ours] = t(f"{mp}.{hf}")
    return out


def _load_vision(ld: _Loader) -> Optional[dict]:
    """Vision tower (qwen2/2.5/3-VL family) → models/vision.py pytree.

    Mirrors the reference's Qwen3VLVisionModel::new tensor names
    (qwen3_vl/vision.rs:660-735): patch_embed.proj (conv3d — summed over
    the temporal axis, exact for static images since frames are repeats),
    pos_embed, blocks.{i}.{norm1,norm2,attn.qkv,attn.proj,mlp.*}, merger,
    deepstack_merger_list.{i}. Returns None when no vision tensors exist.
    """
    st = ld.st
    vp = None
    for cand in ("model.visual", "visual", "vision_tower", "model.vision_tower"):
        if f"{cand}.patch_embed.proj.weight" in st:
            vp = cand
            break
    if vp is None:
        return None
    dt = ld.dtype

    def t(key):
        return st.get(key).astype(dt)

    def lin(prefix):  # [N, K](+bias) → w [K, N], b [N]
        w = t(f"{prefix}.weight").T
        b = t(f"{prefix}.bias") if f"{prefix}.bias" in st else None
        return w, b

    conv = st.get(f"{vp}.patch_embed.proj.weight").astype(jnp.float32)
    if conv.ndim == 5:  # [W, 3, tps, ps, ps] conv3d → temporal sum
        conv = jnp.sum(conv, axis=2)
    W = conv.shape[0]
    params: dict = {
        "patch_embed": conv.reshape(W, -1).T.astype(dt),
    }
    if f"{vp}.patch_embed.proj.bias" in st:
        params["patch_embed_b"] = t(f"{vp}.patch_embed.proj.bias")
    if f"{vp}.pos_embed.weight" in st:
        params["pos_embed"] = t(f"{vp}.pos_embed.weight")

    blocks: List[dict] = []
    i = 0
    while f"{vp}.blocks.{i}.norm1.weight" in st:
        p = f"{vp}.blocks.{i}"
        b = {
            "ln1_w": t(f"{p}.norm1.weight"),
            "ln1_b": t(f"{p}.norm1.bias"),
            "ln2_w": t(f"{p}.norm2.weight"),
            "ln2_b": t(f"{p}.norm2.bias"),
        }
        b["qkv"], b["qkv_b"] = lin(f"{p}.attn.qkv")
        b["proj"], b["proj_b"] = lin(f"{p}.attn.proj")
        if f"{p}.mlp.linear_fc1.weight" in st:  # qwen3-VL
            b["fc1"], b["fc1_b"] = lin(f"{p}.mlp.linear_fc1")
            b["fc2"], b["fc2_b"] = lin(f"{p}.mlp.linear_fc2")
        elif f"{p}.mlp.gate_proj.weight" in st:  # qwen2.5-VL gated
            b["gate"], b["gate_b"] = lin(f"{p}.mlp.gate_proj")
            b["fc1"], b["fc1_b"] = lin(f"{p}.mlp.up_proj")
            b["fc2"], b["fc2_b"] = lin(f"{p}.mlp.down_proj")
        else:  # qwen2-VL
            b["fc1"], b["fc1_b"] = lin(f"{p}.mlp.fc1")
            b["fc2"], b["fc2_b"] = lin(f"{p}.mlp.fc2")
        blocks.append(b)
        i += 1
    # drop Nones (unbiased projections) uniformly before stacking
    keys = set(blocks[0]) if blocks else set()
    params["blocks"] = _stack(
        [{k: v for k, v in b.items() if v is not None and k in keys} for b in blocks]
    )

    mp = f"{vp}.merger"
    if f"{mp}.norm.weight" in st:  # qwen3-VL
        params["merger_ln_w"] = t(f"{mp}.norm.weight")
        params["merger_ln_b"] = t(f"{mp}.norm.bias")
        fc1, fc1_b = lin(f"{mp}.linear_fc1")
        fc2, fc2_b = lin(f"{mp}.linear_fc2")
    else:  # qwen2/2.5-VL: ln_q + mlp.0 / mlp.2
        params["merger_ln_w"] = t(f"{mp}.ln_q.weight")
        params["merger_ln_b"] = t(f"{mp}.ln_q.bias")
        fc1, fc1_b = lin(f"{mp}.mlp.0")
        fc2, fc2_b = lin(f"{mp}.mlp.2")
    params["merger_fc1"], params["merger_fc2"] = fc1, fc2
    if fc1_b is not None:
        params["merger_fc1_b"] = fc1_b
    if fc2_b is not None:
        params["merger_fc2_b"] = fc2_b

    # deepstack mergers (qwen3-VL)
    ds = []
    i = 0
    while f"{vp}.deepstack_merger_list.{i}.norm.weight" in st:
        p = f"{vp}.deepstack_merger_list.{i}"
        d = {
            "ln_w": t(f"{p}.norm.weight"),
            "ln_b": t(f"{p}.norm.bias"),
        }
        d["fc1"], d["fc1_b"] = lin(f"{p}.linear_fc1")
        d["fc2"], d["fc2_b"] = lin(f"{p}.linear_fc2")
        ds.append(d)
        i += 1
    if ds:
        stacked = _stack(ds)
        for ours, theirs in (
            ("ds_ln_w", "ln_w"), ("ds_ln_b", "ln_b"), ("ds_fc1", "fc1"),
            ("ds_fc1_b", "fc1_b"), ("ds_fc2", "fc2"), ("ds_fc2_b", "fc2_b"),
        ):
            params[ours] = stacked[theirs]
    return params


def load_params(
    src,
    config: ModelConfig,
    *,
    quant: Optional[str] = "auto",
    quant_group: int = 128,
    dtype=jnp.bfloat16,
) -> dict:
    """Load a checkpoint into the model-family pytree.

    `src` is a model directory (safetensors shards) or any state-dict-like
    object with get/keys/__contains__ (e.g. utils.gguf.GGUFStateDict).

    quant="auto" (default) applies int4 ISQ to FP4 checkpoints so their
    weights stream at 4-bit (see resolve_auto_quant); other checkpoints
    load as-is. Explicit None/"none" disables ISQ; "int4"/"int8" force it.
    """
    st = SafetensorsDir(src) if isinstance(src, str) else src
    quant, quant_group = resolve_auto_quant(st, quant, quant_group)
    ld = _Loader(st, config, quant, quant_group, dtype)
    cfg = config
    if cfg.model_type.startswith("gemma4"):
        return _load_gemma4(ld, cfg, dtype)
    if cfg.model_type.startswith("llama4"):
        return _load_llama4(ld, cfg, dtype)
    L = cfg.num_hidden_layers
    is_mla = cfg.kv_lora_rank > 0
    is_moe = cfg.num_experts > 0
    Ld = cfg.first_k_dense_replace if is_moe else 0

    params: dict = {
        "embed": ld.t(f"{ld.pre}.embed_tokens.weight"),
        "final_norm": ld.norm(f"{ld.pre}.norm"),
    }
    dense_fn = _mla_dense_layer if is_mla else _dense_layer
    moe_fn = _mla_moe_layer if is_mla else _moe_layer

    from vllm_rs_tpu.utils.progress import ProgressBar

    with ProgressBar(L, "loading layers") as pb:

        def _layers(fn, lo, hi):
            out = []
            for i in range(lo, hi):
                out.append(fn(ld, i))
                pb.step()
            return _stack(out)

        if is_moe:
            if Ld:
                params["dense_layers"] = _layers(dense_fn, 0, Ld)
            params["moe_layers"] = _layers(moe_fn, Ld, L)
        else:
            params["layers"] = _layers(dense_fn, 0, L)

    if not cfg.tie_word_embeddings:
        head = st.get("lm_head.weight").astype(dtype).T
        # per-channel int8 head (see models/llama.py init_params)
        params["lm_head"] = _maybe_quant(
            head, "int8" if quant is not None else None, head.shape[0]
        )
    vision = _load_vision(ld)
    if vision is not None:
        params["vision"] = vision
    else:
        extra = _load_siglip(ld) or _load_pixtral(ld)
        if extra is not None:
            params.update(extra)
    logger.info("loaded %d tensors from %s", len(list(st.keys())), src)
    return params


def load_gguf_model(
    gguf_path: str, *, quant=None, quant_group: int = 128, block_size: int = 16
):
    """GGUF file → (model, params, config): metadata-synthesized config,
    dequantize → (optionally) requantize into the canonical device formats.
    """
    from vllm_rs_tpu.models import get_model_class
    from vllm_rs_tpu.utils.gguf import GGUFFile, GGUFStateDict, config_from_gguf

    g = GGUFFile(gguf_path)
    config = config_from_gguf(g)
    cls = get_model_class(config.model_type)
    model = cls(config, block_size=block_size)
    params = load_params(
        GGUFStateDict(g), config, quant=quant, quant_group=quant_group
    )
    return model, params


def apply_yarn_override(cfg_dict: dict, factor: float) -> dict:
    """Install a CLI-supplied YaRN factor into an HF config dict
    (reference utils/mod.rs:640-706): original context is preserved in
    original_max_position_embeddings and the advertised max extends to
    factor × original."""
    cfg_dict = dict(cfg_dict)
    existing = cfg_dict.get("rope_scaling") or {}
    orig = int(
        existing.get("original_max_position_embeddings")
        or cfg_dict.get("max_position_embeddings", 4096)
    )
    rs = dict(existing)
    rs.update(
        {
            "rope_type": "yarn",
            "factor": float(factor),
            "original_max_position_embeddings": orig,
        }
    )
    rs.pop("type", None)
    cfg_dict["rope_scaling"] = rs
    cfg_dict["max_position_embeddings"] = int(orig * factor)
    return cfg_dict


def load_model(model_dir: str, *, quant="auto", quant_group: int = 128,
               block_size: int = 16, yarn_scaling_factor: float = 0.0):
    """config.json + safetensors → (model instance, params).

    quant="auto" (default) requantizes FP4 checkpoints to packed int4 on
    load (resolve_auto_quant); "none"/None disables ISQ.

    yarn_scaling_factor > 0 overrides/installs YaRN rope scaling from the
    CLI (reference --yarn-scaling-factor, utils/mod.rs:640-706): extends the
    advertised context to factor × original_max_position_embeddings.
    """
    from vllm_rs_tpu.models import get_model_class

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    if yarn_scaling_factor and yarn_scaling_factor > 0:
        cfg_dict = apply_yarn_override(cfg_dict, yarn_scaling_factor)
    config = ModelConfig.from_hf_dict(cfg_dict)
    cls = get_model_class(config.model_type)
    model = cls(config, block_size=block_size)
    params = load_params(model_dir, config, quant=quant, quant_group=quant_group)
    return model, params
