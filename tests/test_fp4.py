"""MXFP4 / NVFP4 packed-checkpoint decode + loader integration.

Mirrors the reference's LnMxfp4/LnNvfp4 loaders (linear.rs:1080-1306);
on TPU the formats are decoded to bf16 at load (exact: E2M1 x E8M0/E4M3
products fit bf16's 8 significand bits), not kept for a runtime kernel.
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from tests.test_loader import _llama_to_hf, _np, _save
from vllm_rs_tpu.config import ModelConfig
from vllm_rs_tpu.models.layers import Linear
from vllm_rs_tpu.quant.fp4 import (
    E2M1_LUT,
    decode_e2m1,
    decode_e4m3,
    decode_e8m0,
    encode_e2m1,
    mxfp4_dequant,
    nvfp4_dequant,
    quantize_mxfp4,
)
from vllm_rs_tpu.utils.loader import load_params


def test_e2m1_codes_roundtrip():
    vals = E2M1_LUT[None, :].repeat(2, 0)  # [2, 16], all 16 codes
    packed = encode_e2m1(vals)
    np.testing.assert_array_equal(decode_e2m1(packed), vals)


def test_e8m0_decode():
    s = np.array([127, 128, 126, 0, 255], dtype=np.uint8)
    np.testing.assert_allclose(
        decode_e8m0(s), [1.0, 2.0, 0.5, 2.0 ** -127, 0.0]
    )


def test_e4m3_decode_matches_mldtypes():
    bits = np.arange(256, dtype=np.uint8)
    ours = decode_e4m3(bits)
    ref = bits.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    both_nan = np.isnan(ours) & np.isnan(ref)
    np.testing.assert_array_equal(ours[~both_nan], ref[~both_nan])


def test_mxfp4_quant_dequant_bounded_error():
    rng = np.random.RandomState(0)
    w = rng.randn(8, 64).astype(np.float32) * 0.05
    blocks, scales = quantize_mxfp4(w)
    deq = mxfp4_dequant(blocks, scales)
    assert blocks.shape == (8, 32) and scales.shape == (8, 2)
    err = np.abs(deq - w)
    # E2M1's coarsest gap is 2 (between codes 4 and 6) → half-gap of 1.0
    # in scaled units
    scale_step = np.repeat(decode_e8m0(scales), 32, axis=-1)
    assert np.all(err <= 1.0 * scale_step + 1e-7)


def test_nvfp4_dequant_applies_block_and_global_scales():
    w_codes = np.array([[0x32, 0x75]], dtype=np.uint8)  # lo,hi = 1,1.5,3,6... decode
    vals = decode_e2m1(w_codes)[0]  # [4]
    scales = np.array([[0.5]], dtype=np.float32).astype(ml_dtypes.float8_e4m3fn)
    deq = nvfp4_dequant(
        np.pad(w_codes, ((0, 0), (0, 6))),  # pad K/2 to 8 → K=16, one block
        scales.view(np.uint8),
        global_scale=2.0,
    )
    np.testing.assert_allclose(deq[0, :4], vals * 0.5 * 2.0)


def _tiny_cfg():
    return ModelConfig(
        model_type="qwen3",
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        qk_norm=True,
        attention_bias=True,  # separate q/k/v so the HF inverse mapping exists
        eos_token_ids=(0,),
    )


def _pack_linears_fp4(sd: dict, fmt: str) -> dict:
    """Rewrite every `.weight` projection entry into the packed layout."""
    out = {}
    for k, v in sd.items():
        if not (
            k.endswith(".weight")
            and ("_proj.weight" in k)
            and v.ndim == 2
            and v.shape[1] % 32 == 0
        ):
            out[k] = v
            continue
        base = k[: -len(".weight")]
        if fmt == "mxfp4":
            blocks, scales = quantize_mxfp4(v.astype(np.float32))
            out[base + ".weight_packed"] = blocks
            out[base + ".weight_scale"] = scales
        else:  # nvfp4: per-16 E4M3 scales + modelopt global multiplier
            N, K = v.shape
            g = v.astype(np.float32).reshape(N, K // 16, 16)
            gmax = np.abs(v).max() or 1.0
            global_scale = np.float32(gmax / 6.0)
            amax = np.abs(g).max(axis=-1) / (6.0 * global_scale)
            s8 = np.maximum(amax, 2.0 ** -6).astype(ml_dtypes.float8_e4m3fn)
            sf = s8.astype(np.float32)
            scaled = g / (sf * global_scale)[..., None]
            out[base + ".weight"] = encode_e2m1(scaled.reshape(N, K))
            out[base + ".weight_scale"] = s8.view(np.uint8)
            out[base + ".weight_scale_2"] = np.asarray([global_scale])
    return out


def _expected(sd, base):
    if base + ".weight_packed" in sd:
        return mxfp4_dequant(sd[base + ".weight_packed"], sd[base + ".weight_scale"])
    return nvfp4_dequant(
        sd[base + ".weight"],
        sd[base + ".weight_scale"],
        float(sd[base + ".weight_scale_2"][0]),
    )


def _loaded_leaf(loaded, name, i):
    w = loaded["layers"][name]
    if isinstance(w, Linear):
        w = w.w
    return _np(w[i])


def test_auto_isq_requantizes_fp4_to_int4(tmp_path):
    """quant="auto" (the default) must detect FP4 checkpoints and load the
    projections as packed int4 — streaming at 4-bit instead of
    materializing bf16 at 4x the checkpoint bytes (VERDICT r2 item 6;
    reference keeps FP4 packed end-to-end, linear.rs:1080-1306). The auto
    path must be bit-identical to quantizing the bf16-materialized path."""
    from vllm_rs_tpu.models.llama import CausalLM
    from vllm_rs_tpu.quant.pack import PackedInt4Tensor, quantize_param
    from vllm_rs_tpu.utils.loader import detect_checkpoint_fp4, SafetensorsDir

    cfg = _tiny_cfg()
    model = CausalLM(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    for fmt in ("mxfp4", "nvfp4"):
        sd = _pack_linears_fp4(_llama_to_hf(params, cfg), fmt)
        d = tmp_path / fmt
        d.mkdir()
        _save(sd, d / "model.safetensors")
        assert detect_checkpoint_fp4(SafetensorsDir(str(d))) == fmt
        # tiny K=64 projections need group 32 to be divisible
        auto = load_params(str(d), cfg, quant_group=32)  # quant defaults to "auto"
        bf16 = load_params(str(d), cfg, quant=None)
        for name in ("q", "k", "v", "o"):
            leaf = auto["layers"][name]
            if isinstance(leaf, Linear):
                leaf, ref = leaf.w, bf16["layers"][name].w
            else:
                ref = bf16["layers"][name]
            assert isinstance(leaf, PackedInt4Tensor), (fmt, name)
            want = jax.vmap(lambda x: quantize_param(x, "int4", 32))(ref)
            np.testing.assert_array_equal(_np(leaf.qweight), _np(want.qweight))
            np.testing.assert_allclose(_np(leaf.scales), _np(want.scales))


def test_auto_isq_noop_on_plain_checkpoints(tmp_path):
    """Non-FP4 checkpoints load unquantized under quant="auto"."""
    from vllm_rs_tpu.models.llama import CausalLM
    from vllm_rs_tpu.utils.loader import detect_checkpoint_fp4, SafetensorsDir

    cfg = _tiny_cfg()
    model = CausalLM(cfg)
    params = model.init_params(jax.random.PRNGKey(6))
    sd = _llama_to_hf(params, cfg)
    d = tmp_path / "plain"
    d.mkdir()
    _save(sd, d / "model.safetensors")
    assert detect_checkpoint_fp4(SafetensorsDir(str(d))) is None
    loaded = load_params(str(d), cfg)
    leaf = loaded["layers"]["q"]
    if isinstance(leaf, Linear):
        leaf = leaf.w
    assert leaf.dtype == jnp.bfloat16


def test_loader_decodes_fp4_checkpoints(tmp_path):
    from vllm_rs_tpu.models.llama import CausalLM

    cfg = _tiny_cfg()
    model = CausalLM(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    for fmt in ("mxfp4", "nvfp4"):
        sd = _pack_linears_fp4(_llama_to_hf(params, cfg), fmt)
        d = tmp_path / fmt
        d.mkdir()
        _save(sd, d / "model.safetensors")
        # quant=None: the explicit --quant none escape hatch (the default
        # "auto" would requantize fp4 checkpoints to packed int4)
        loaded = load_params(str(d), cfg, quant=None)
        # compare each projection against the packed tensors' own dequant
        # (transposed to our [K, N])
        for i in range(cfg.num_hidden_layers):
            p = f"model.layers.{i}"
            for ours, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
                want = _expected(sd, f"{p}.self_attn.{hf}").T
                np.testing.assert_allclose(
                    _loaded_leaf(loaded, ours, i), want, atol=2e-3,
                    err_msg=f"{fmt} {hf}",
                )
