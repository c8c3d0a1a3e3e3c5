"""GGUF checkpoint support: parser, K-quant dequantization, config synthesis.

Counterpart of the reference's gguf loaders (utils/gguf_helper.rs,
utils/gguf_varbuilder.rs, config_from_gguf at utils/mod.rs:137): parses the
GGUF container, decodes the GGML quantized block formats to float32 with
vectorized numpy (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 and the K-quants
Q2_K/Q3_K/Q4_K/Q5_K/Q6_K), synthesizes a ModelConfig from the metadata, and
maps `blk.N.*` tensor names onto the model pytree. Dequantized weights are
re-quantized into the canonical on-device int4/int8 formats (quant/pack.py)
— the TPU analogue of the reference's ISQ / requantize-after-shard path
(distributed.rs:91-114).

Format reference: https://github.com/ggml-org/ggml/blob/master/docs/gguf.md
(layouts re-derived from the public spec; no reference code copied).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# GGML tensor dtypes (ggml.h enum)
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q4_1 = 3
GGML_Q5_0 = 6
GGML_Q5_1 = 7
GGML_Q8_0 = 8
GGML_Q2_K = 10
GGML_Q3_K = 11
GGML_Q4_K = 12
GGML_Q5_K = 13
GGML_Q6_K = 14
GGML_I8 = 24
GGML_I16 = 25
GGML_I32 = 26
GGML_BF16 = 30

QK = 32  # simple-quant block size
QK_K = 256  # K-quant super-block size

# dtype → bytes per block
_BLOCK_BYTES = {
    GGML_F32: (1, 4),
    GGML_F16: (1, 2),
    GGML_BF16: (1, 2),
    GGML_I8: (1, 1),
    GGML_Q4_0: (QK, 2 + 16),
    GGML_Q4_1: (QK, 4 + 16),
    GGML_Q5_0: (QK, 2 + 4 + 16),
    GGML_Q5_1: (QK, 4 + 4 + 16),
    GGML_Q8_0: (QK, 2 + 32),
    GGML_Q2_K: (QK_K, 16 + 64 + 2 + 2),
    GGML_Q3_K: (QK_K, 32 + 64 + 12 + 2),
    GGML_Q4_K: (QK_K, 2 + 2 + 12 + 128),
    GGML_Q5_K: (QK_K, 2 + 2 + 12 + 32 + 128),
    GGML_Q6_K: (QK_K, 128 + 64 + 16 + 2),
}


# ---------------------------------------------------------------------------
# container parsing
# ---------------------------------------------------------------------------

_VALUE_FMT = {
    0: ("<B", 1), 1: ("<b", 1), 2: ("<H", 2), 3: ("<h", 2),
    4: ("<I", 4), 5: ("<i", 4), 6: ("<f", 4), 7: ("<?", 1),
    10: ("<Q", 8), 11: ("<q", 8), 12: ("<d", 8),
}


def _read_string(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _VALUE_FMT:
        fmt, n = _VALUE_FMT[vtype]
        return struct.unpack(fmt, f.read(n))[0]
    if vtype == 8:
        return _read_string(f)
    if vtype == 9:  # array
        (etype,) = struct.unpack("<I", f.read(4))
        (count,) = struct.unpack("<Q", f.read(8))
        if etype in _VALUE_FMT and etype != 7:
            fmt, n = _VALUE_FMT[etype]
            raw = f.read(n * count)
            return list(np.frombuffer(raw, dtype=np.dtype(fmt[1:])))
        return [_read_value(f, etype) for _ in range(count)]
    raise ValueError(f"unknown GGUF value type {vtype}")


@dataclass
class GGUFTensorInfo:
    name: str
    shape: Tuple[int, ...]  # logical (torch-order) shape: [rows, cols]
    ggml_dtype: int
    offset: int  # relative to data section start
    nbytes: int


class GGUFFile:
    """Parsed GGUF container with lazy per-tensor dequantization."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: Dict[str, Any] = {}
        self.tensors: Dict[str, GGUFTensorInfo] = {}
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
            if version < 2:
                raise ValueError(f"GGUF v{version} unsupported (need >= 2)")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = _read_string(f)
                (vtype,) = struct.unpack("<I", f.read(4))
                self.metadata[key] = _read_value(f, vtype)
            infos = []
            for _ in range(n_tensors):
                name = _read_string(f)
                (n_dims,) = struct.unpack("<I", f.read(4))
                ne = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
                dtype, offset = struct.unpack("<IQ", f.read(12))
                # ne[0] is the contiguous dim → logical shape is reversed
                shape = tuple(reversed(ne))
                if dtype not in _BLOCK_BYTES:
                    raise ValueError(f"tensor {name}: unsupported ggml dtype {dtype}")
                bk, bb = _BLOCK_BYTES[dtype]
                count = int(np.prod(shape))
                nbytes = count // bk * bb
                infos.append(GGUFTensorInfo(name, shape, dtype, offset, nbytes))
            align = int(self.metadata.get("general.alignment", 32))
            pos = f.tell()
            self.data_start = (pos + align - 1) // align * align
            for ti in infos:
                self.tensors[ti.name] = ti

    def keys(self):
        return self.tensors.keys()

    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def get(self, name: str) -> np.ndarray:
        """Dequantize tensor `name` → float32 ndarray in logical shape."""
        ti = self.tensors[name]
        with open(self.path, "rb") as f:
            f.seek(self.data_start + ti.offset)
            raw = f.read(ti.nbytes)
        flat = dequantize_ggml(np.frombuffer(raw, dtype=np.uint8), ti.ggml_dtype)
        return flat.reshape(ti.shape)


# ---------------------------------------------------------------------------
# GGML block dequantization (vectorized numpy)
# ---------------------------------------------------------------------------


def _f16(u8: np.ndarray) -> np.ndarray:
    return u8.view(np.float16).astype(np.float32)


def _split_nibbles(qs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """byte array → (low nibbles, high nibbles) as int32."""
    q = qs.astype(np.int32)
    return q & 0xF, q >> 4


def dequantize_ggml(raw: np.ndarray, dtype: int) -> np.ndarray:
    """raw uint8 buffer → float32 flat array (native C++ fast path when the
    toolchain is available; vectorized numpy otherwise)."""
    if dtype != GGML_F32:
        from vllm_rs_tpu.native import native_dequantize_ggml

        out = native_dequantize_ggml(raw, dtype)
        if out is not None:
            return out
    if dtype == GGML_F32:
        return raw.view(np.float32).copy()
    if dtype == GGML_F16:
        return raw.view(np.float16).astype(np.float32)
    if dtype == GGML_BF16:
        out = np.zeros(raw.size // 2, dtype=np.uint32)
        out |= raw.view(np.uint16).astype(np.uint32) << 16
        return out.view(np.float32).copy()
    if dtype == GGML_I8:
        return raw.view(np.int8).astype(np.float32)

    bk, bb = _BLOCK_BYTES[dtype]
    blocks = raw.reshape(-1, bb)
    n = blocks.shape[0]

    if dtype == GGML_Q8_0:
        d = _f16(blocks[:, :2])[:, 0]  # [n]
        q = blocks[:, 2:].view(np.int8).astype(np.float32)
        return (q * d[:, None]).reshape(-1)

    if dtype == GGML_Q4_0:
        d = _f16(blocks[:, :2])[:, 0]
        lo, hi = _split_nibbles(blocks[:, 2:])
        q = np.concatenate([lo, hi], axis=1).astype(np.float32) - 8.0
        return (q * d[:, None]).reshape(-1)

    if dtype == GGML_Q4_1:
        d = _f16(blocks[:, 0:2])[:, 0]
        m = _f16(blocks[:, 2:4])[:, 0]
        lo, hi = _split_nibbles(blocks[:, 4:])
        q = np.concatenate([lo, hi], axis=1).astype(np.float32)
        return (q * d[:, None] + m[:, None]).reshape(-1)

    if dtype in (GGML_Q5_0, GGML_Q5_1):
        off = 2 if dtype == GGML_Q5_0 else 4
        d = _f16(blocks[:, 0:2])[:, 0]
        m = _f16(blocks[:, 2:4])[:, 0] if dtype == GGML_Q5_1 else None
        qh = blocks[:, off : off + 4].copy().view(np.uint32)[:, 0]  # [n]
        lo, hi = _split_nibbles(blocks[:, off + 4 :])
        bits = (qh[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
        q = np.concatenate([lo, hi], axis=1).astype(np.int32) | (bits.astype(np.int32) << 4)
        q = q.astype(np.float32)
        if dtype == GGML_Q5_0:
            return ((q - 16.0) * d[:, None]).reshape(-1)
        return (q * d[:, None] + m[:, None]).reshape(-1)

    if dtype == GGML_Q4_K:
        d = _f16(blocks[:, 0:2])[:, 0]
        dmin = _f16(blocks[:, 2:4])[:, 0]
        sc, mn = _unpack_k_scales(blocks[:, 4:16])  # [n, 8] each, 6-bit
        qs = blocks[:, 16:]  # [n, 128]
        lo, hi = _split_nibbles(qs)  # each [n, 128] for 256 values
        # value layout: for each 64-value chunk j (qs bytes 32j..32j+32):
        # low nibbles are sub-block 2j, high nibbles sub-block 2j+1
        q = np.empty((n, 256), dtype=np.float32)
        for j in range(4):
            q[:, 64 * j : 64 * j + 32] = lo[:, 32 * j : 32 * (j + 1)]
            q[:, 64 * j + 32 : 64 * j + 64] = hi[:, 32 * j : 32 * (j + 1)]
        sub = np.repeat(np.arange(8), 32)[None, :]  # value → sub-block idx
        scale = d[:, None] * np.take_along_axis(sc, np.broadcast_to(sub, (n, 256)), 1)
        minv = dmin[:, None] * np.take_along_axis(mn, np.broadcast_to(sub, (n, 256)), 1)
        return (scale * q - minv).reshape(-1)

    if dtype == GGML_Q5_K:
        d = _f16(blocks[:, 0:2])[:, 0]
        dmin = _f16(blocks[:, 2:4])[:, 0]
        sc, mn = _unpack_k_scales(blocks[:, 4:16])
        qh = blocks[:, 16:48]  # [n, 32] — bit i of byte b = high bit of value
        qs = blocks[:, 48:]  # [n, 128]
        lo, hi = _split_nibbles(qs)
        q4 = np.empty((n, 256), dtype=np.int32)
        for j in range(4):
            q4[:, 64 * j : 64 * j + 32] = lo[:, 32 * j : 32 * (j + 1)]
            q4[:, 64 * j + 32 : 64 * j + 64] = hi[:, 32 * j : 32 * (j + 1)]
        # high bits: value v (0..255) lives at qh[:, v % 32] bit (v // 32)
        vidx = np.arange(256)
        hbit = (qh[:, vidx % 32].astype(np.int32) >> (vidx // 32)[None, :]) & 1
        q = (q4 | (hbit << 4)).astype(np.float32)
        sub = np.repeat(np.arange(8), 32)[None, :]
        scale = d[:, None] * np.take_along_axis(sc, np.broadcast_to(sub, (n, 256)), 1)
        minv = dmin[:, None] * np.take_along_axis(mn, np.broadcast_to(sub, (n, 256)), 1)
        return (scale * q - minv).reshape(-1)

    if dtype == GGML_Q6_K:
        ql = blocks[:, 0:128]
        qh = blocks[:, 128:192]
        scales = blocks[:, 192:208].view(np.int8).astype(np.float32)  # [n, 16]
        d = _f16(blocks[:, 208:210])[:, 0]
        # per ggml: two 128-value halves; in each half h (ql bytes 64h..64h+64,
        # qh bytes 32h..32h+32):
        #   v in [0,32):   q = (ql[v] & 0xF)  | ((qh[v] >> 0 & 3) << 4)
        #   v in [32,64):  q = (ql[v+32]&0xF) | ((qh[v-32... ]) ...)
        q = np.empty((n, 256), dtype=np.int32)
        for h in range(2):
            l = ql[:, 64 * h : 64 * h + 64].astype(np.int32)
            hbits = qh[:, 32 * h : 32 * h + 32].astype(np.int32)
            q[:, 128 * h + 0 : 128 * h + 32] = (l[:, 0:32] & 0xF) | (((hbits >> 0) & 3) << 4)
            q[:, 128 * h + 32 : 128 * h + 64] = (l[:, 32:64] & 0xF) | (((hbits >> 2) & 3) << 4)
            q[:, 128 * h + 64 : 128 * h + 96] = (l[:, 0:32] >> 4) | (((hbits >> 4) & 3) << 4)
            q[:, 128 * h + 96 : 128 * h + 128] = (l[:, 32:64] >> 4) | (((hbits >> 6) & 3) << 4)
        qf = q.astype(np.float32) - 32.0
        sub = np.repeat(np.arange(16), 16)[None, :]  # 16 sub-blocks of 16
        scale = d[:, None] * np.take_along_axis(scales, np.broadcast_to(sub, (n, 256)), 1)
        return (scale * qf).reshape(-1)

    if dtype == GGML_Q2_K:
        scales = blocks[:, 0:16].astype(np.int32)  # [n,16]: low=scale, high=min
        qs = blocks[:, 16:80].astype(np.int32)  # [n,64] 2-bit packed
        d = _f16(blocks[:, 80:82])[:, 0]
        dmin = _f16(blocks[:, 82:84])[:, 0]
        # values: for each 32-byte strip s (qs bytes 32s..32s+32), shift p:
        # sub-block (4s + p) holds ((qs >> 2p) & 3)
        q = np.empty((n, 256), dtype=np.float32)
        for s in range(2):
            strip = qs[:, 32 * s : 32 * (s + 1)]
            for p in range(4):
                q[:, 128 * s + 32 * p : 128 * s + 32 * (p + 1)] = (strip >> (2 * p)) & 3
        sub = np.repeat(np.arange(16), 16)[None, :]
        sc = (scales & 0xF).astype(np.float32)
        mn = (scales >> 4).astype(np.float32)
        scale = d[:, None] * np.take_along_axis(sc, np.broadcast_to(sub, (n, 256)), 1)
        minv = dmin[:, None] * np.take_along_axis(mn, np.broadcast_to(sub, (n, 256)), 1)
        return (scale * q - minv).reshape(-1)

    if dtype == GGML_Q3_K:
        hmask = blocks[:, 0:32].astype(np.int32)
        qs = blocks[:, 32:96].astype(np.int32)
        raw_sc = blocks[:, 96:108]  # 12 bytes → 16 6-bit scales
        d = _f16(blocks[:, 108:110])[:, 0]
        q = np.empty((n, 256), dtype=np.int32)
        for s in range(2):
            strip = qs[:, 32 * s : 32 * (s + 1)]
            for p in range(4):
                q[:, 128 * s + 32 * p : 128 * s + 32 * (p + 1)] = (strip >> (2 * p)) & 3
        # high bit: value v uses hmask[:, v % 32] bit (v // 32); hm SET means
        # q stays low (ggml subtracts 4 when bit NOT set)
        vidx = np.arange(256)
        hbit = (hmask[:, vidx % 32] >> (vidx // 32)[None, :]) & 1
        qf = (q - np.where(hbit == 0, 4, 0)).astype(np.float32)
        sc = _unpack_q3k_scales(raw_sc).astype(np.float32)  # [n, 16], int -32..31
        sub = np.repeat(np.arange(16), 16)[None, :]
        scale = d[:, None] * np.take_along_axis(sc, np.broadcast_to(sub, (n, 256)), 1)
        return (scale * qf).reshape(-1)

    raise ValueError(f"unsupported ggml dtype {dtype}")


def _unpack_k_scales(b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Q4_K/Q5_K 12-byte scale block → (scales [n,8], mins [n,8]), 6-bit.

    Layout (ggml get_scale_min_k4): for j<4: sc=b[j]&63, m=b[j+4]&63;
    for j>=4: sc=(b[j+4]&0xF)|((b[j-4]>>6)<<4), m=(b[j+4]>>4)|((b[j]>>6)<<4).
    """
    b = b.astype(np.int32)
    sc = np.empty((b.shape[0], 8), dtype=np.float32)
    mn = np.empty((b.shape[0], 8), dtype=np.float32)
    for j in range(4):
        sc[:, j] = b[:, j] & 63
        mn[:, j] = b[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (b[:, j + 4] & 0xF) | ((b[:, j - 4] >> 6) << 4)
        mn[:, j] = (b[:, j + 4] >> 4) | ((b[:, j] >> 6) << 4)
    return sc, mn


def _unpack_q3k_scales(b: np.ndarray) -> np.ndarray:
    """Q3_K 12-byte scale block → [n, 16] signed 6-bit scales.

    Layout (ggml): scales[j] for j<8 low 4 bits from b[j%8] (low/high nibble
    by j//8... concretely: j<4 → b[j]&0xF | ((b[j+8]&3)<<4);
    4<=j<8 → b[j]&0xF | (((b[j+8]>>2)&3)<<4);
    8<=j<12 → b[j-8]>>4 | (((b[j])&... — re-derived below), minus 32.
    """
    b = b.astype(np.int32)
    n = b.shape[0]
    sc = np.empty((n, 16), dtype=np.int32)
    for j in range(16):
        if j < 8:
            low = b[:, j] & 0xF
        else:
            low = b[:, j - 8] >> 4
        hi = (b[:, 8 + (j % 4)] >> (2 * (j // 4))) & 3
        sc[:, j] = (hi << 4) | low
    return sc - 32


# ---------------------------------------------------------------------------
# metadata → ModelConfig (reference config_from_gguf, utils/mod.rs:137)
# ---------------------------------------------------------------------------

_GGUF_ARCH_MAP = {
    "llama": "llama",
    "qwen2": "qwen2",
    "qwen3": "qwen3",
    "qwen3moe": "qwen3_moe",
    "gemma2": "gemma2",
    "gemma3": "gemma3",
    "phi3": "phi3",
    "glm4": "glm4",
    "deepseek2": "deepseek_v2",
}


def config_from_gguf(g: GGUFFile) -> "ModelConfig":
    from vllm_rs_tpu.config import ModelConfig

    md = g.metadata
    arch = md.get("general.architecture", "llama")

    def get(key, default=None):
        return md.get(f"{arch}.{key}", default)

    mt = _GGUF_ARCH_MAP.get(arch, arch)
    hidden = int(get("embedding_length", 4096))
    n_heads = int(get("attention.head_count", 32))
    eos = md.get("tokenizer.ggml.eos_token_id")
    cfg = {
        "model_type": mt,
        "hidden_size": hidden,
        "intermediate_size": int(get("feed_forward_length", 4 * hidden)),
        "num_hidden_layers": int(get("block_count", 32)),
        "num_attention_heads": n_heads,
        "num_key_value_heads": int(get("attention.head_count_kv", n_heads)),
        "head_dim": int(get("attention.key_length", 0) or 0),
        "vocab_size": int(
            get("vocab_size", len(md.get("tokenizer.ggml.tokens", [])) or 32000)
        ),
        "max_position_embeddings": int(get("context_length", 8192)),
        "rms_norm_eps": float(get("attention.layer_norm_rms_epsilon", 1e-6)),
        "rope_theta": float(get("rope.freq_base", 10000.0)),
        "eos_token_id": int(eos) if eos is not None else [],
        "num_experts": int(get("expert_count", 0) or 0),
        "num_experts_per_tok": int(get("expert_used_count", 0) or 0),
        "moe_intermediate_size": int(get("expert_feed_forward_length", 0) or 0),
        "tie_word_embeddings": "output.weight" not in g,
    }
    return ModelConfig.from_hf_dict(cfg, mt)


def tokenizer_from_gguf(g: GGUFFile):
    """Reconstruct a `tokenizers.Tokenizer` from GGUF metadata (reference
    gguf_helper.rs BPE/Unigram reconstruction): `tokenizer.ggml.model` is
    "gpt2" (byte-level BPE with merges) or "llama" (SentencePiece unigram
    with scores)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    md = g.metadata
    tokens = md.get("tokenizer.ggml.tokens")
    if not tokens:
        return None
    kind = md.get("tokenizer.ggml.model", "gpt2")
    if kind == "gpt2":
        vocab = {t: i for i, t in enumerate(tokens)}
        merges = []
        for m in md.get("tokenizer.ggml.merges", []) or []:
            a, _, b = m.partition(" ")
            merges.append((a, b))
        tok = Tokenizer(models.BPE(vocab, merges, fuse_unk=False))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
    else:  # "llama": unigram/SPM with per-token scores
        scores = md.get("tokenizer.ggml.scores") or [0.0] * len(tokens)
        unk = int(md.get("tokenizer.ggml.unknown_token_id", 0))
        tok = Tokenizer(
            models.Unigram([(t, float(s)) for t, s in zip(tokens, scores)], unk)
        )
        tok.decoder = decoders.Replace("▁", " ")
    return tok


# GGUF tensor name → HF-style submodule path (per layer)
_GGUF_NAMES = {
    "attn_q": "self_attn.q_proj",
    "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj",
    "attn_output": "self_attn.o_proj",
    "attn_norm": "input_layernorm",
    "ffn_norm": "post_attention_layernorm",
    "ffn_gate": "mlp.gate_proj",
    "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    "attn_q_norm": "self_attn.q_norm",
    "attn_k_norm": "self_attn.k_norm",
    "ffn_gate_inp": "mlp.gate",
    "ffn_gate_exps": "mlp.experts.gate_proj",  # stacked [E, I, D]
    "ffn_up_exps": "mlp.experts.up_proj",
    "ffn_down_exps": "mlp.experts.down_proj",
}


class GGUFStateDict:
    """Adapter exposing a GGUF file through HF-style tensor names, so the
    safetensors loader path (utils/loader.py) can consume it unchanged."""

    def __init__(self, g: GGUFFile):
        self.g = g
        self._map: Dict[str, str] = {}
        for name in g.keys():
            hf = self._to_hf(name)
            if hf:
                self._map[hf] = name

    @staticmethod
    def _to_hf(name: str) -> Optional[str]:
        if name == "token_embd.weight":
            return "model.embed_tokens.weight"
        if name == "output_norm.weight":
            return "model.norm.weight"
        if name == "output.weight":
            return "lm_head.weight"
        if not name.startswith("blk."):
            return None
        _, i, rest = name.split(".", 2)
        stem, _, suffix = rest.rpartition(".")
        hf_stem = _GGUF_NAMES.get(stem)
        if hf_stem is None:
            return None
        return f"model.layers.{i}.{hf_stem}.{suffix}"

    def keys(self):
        return self._map.keys()

    def __contains__(self, key: str) -> bool:
        return key in self._map

    def get(self, key: str):
        import jax.numpy as jnp

        arr = self.g.get(self._map[key])
        return jnp.asarray(arr)
