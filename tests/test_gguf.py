"""GGUF parser + GGML dequantization tests.

Ground truth: scalar per-value decoders transcribing the ggml spec formulas
(dequantize_row_* reference behavior), compared against the vectorized
numpy implementations on random bytes.
"""

import struct

import numpy as np
import pytest

from vllm_rs_tpu.utils.gguf import (
    GGML_BF16,
    GGML_F16,
    GGML_F32,
    GGML_Q2_K,
    GGML_Q3_K,
    GGML_Q4_0,
    GGML_Q4_1,
    GGML_Q4_K,
    GGML_Q5_0,
    GGML_Q5_1,
    GGML_Q5_K,
    GGML_Q6_K,
    GGML_Q8_0,
    GGUF_MAGIC,
    GGUFFile,
    GGUFStateDict,
    _BLOCK_BYTES,
    config_from_gguf,
    dequantize_ggml,
)


# ---------------------------------------------------------------------------
# scalar reference decoders (per-value ggml formulas)
# ---------------------------------------------------------------------------


def _f16_at(b, o):
    return float(np.frombuffer(b[o : o + 2], dtype=np.float16)[0])


def _scalar_q8_0(b):
    out = []
    for i in range(0, len(b), 34):
        d = _f16_at(b, i)
        q = np.frombuffer(b[i + 2 : i + 34], dtype=np.int8)
        out.extend(d * float(x) for x in q)
    return np.array(out, np.float32)


def _scalar_q4_0(b):
    out = []
    for i in range(0, len(b), 18):
        d = _f16_at(b, i)
        qs = b[i + 2 : i + 18]
        y = [0.0] * 32
        for j in range(16):
            y[j] = d * ((qs[j] & 0xF) - 8)
            y[j + 16] = d * ((qs[j] >> 4) - 8)
        out.extend(y)
    return np.array(out, np.float32)


def _scalar_q5_1(b):
    out = []
    for i in range(0, len(b), 24):
        d = _f16_at(b, i)
        m = _f16_at(b, i + 2)
        qh = struct.unpack("<I", b[i + 4 : i + 8])[0]
        qs = b[i + 8 : i + 24]
        y = [0.0] * 32
        for j in range(16):
            xh0 = ((qh >> j) << 4) & 0x10
            xh1 = ((qh >> (j + 12)) & 0x10)
            y[j] = ((qs[j] & 0xF) | xh0) * d + m
            y[j + 16] = ((qs[j] >> 4) | xh1) * d + m
        out.extend(y)
    return np.array(out, np.float32)


def _get_scale_min_k4(j, scales):
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    return (
        (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4),
        (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4),
    )


def _scalar_q4_k(b):
    out = []
    for i in range(0, len(b), 144):
        d = _f16_at(b, i)
        dmin = _f16_at(b, i + 2)
        scales = b[i + 4 : i + 16]
        qs = b[i + 16 : i + 144]
        is_ = 0
        qoff = 0
        for j in range(0, 256, 64):
            sc1, m1 = _get_scale_min_k4(is_, scales)
            sc2, m2 = _get_scale_min_k4(is_ + 1, scales)
            d1, mm1 = d * sc1, dmin * m1
            d2, mm2 = d * sc2, dmin * m2
            for l in range(32):
                out.append(d1 * (qs[qoff + l] & 0xF) - mm1)
            for l in range(32):
                out.append(d2 * (qs[qoff + l] >> 4) - mm2)
            qoff += 32
            is_ += 2
    return np.array(out, np.float32)


def _scalar_q5_k(b):
    out = []
    for i in range(0, len(b), 176):
        d = _f16_at(b, i)
        dmin = _f16_at(b, i + 2)
        scales = b[i + 4 : i + 16]
        qh = b[i + 16 : i + 48]
        ql = b[i + 48 : i + 176]
        is_ = 0
        u1, u2 = 1, 2
        qloff = 0
        for j in range(0, 256, 64):
            sc1, m1 = _get_scale_min_k4(is_, scales)
            sc2, m2 = _get_scale_min_k4(is_ + 1, scales)
            d1, mm1 = d * sc1, dmin * m1
            d2, mm2 = d * sc2, dmin * m2
            for l in range(32):
                out.append(d1 * ((ql[qloff + l] & 0xF) + (16 if qh[l] & u1 else 0)) - mm1)
            for l in range(32):
                out.append(d2 * ((ql[qloff + l] >> 4) + (16 if qh[l] & u2 else 0)) - mm2)
            qloff += 32
            is_ += 2
            u1 <<= 2
            u2 <<= 2
    return np.array(out, np.float32)


def _scalar_q6_k(b):
    out = []
    for i in range(0, len(b), 210):
        ql = b[i : i + 128]
        qh = b[i + 128 : i + 192]
        sc = np.frombuffer(b[i + 192 : i + 208], dtype=np.int8)
        d = _f16_at(b, i + 208)
        y = [0.0] * 256
        for n in range(0, 256, 128):
            h = n // 128
            for l in range(32):
                is_ = l // 16
                q1 = ((ql[64 * h + l] & 0xF) | (((qh[32 * h + l] >> 0) & 3) << 4)) - 32
                q2 = ((ql[64 * h + l + 32] & 0xF) | (((qh[32 * h + l] >> 2) & 3) << 4)) - 32
                q3 = ((ql[64 * h + l] >> 4) | (((qh[32 * h + l] >> 4) & 3) << 4)) - 32
                q4 = ((ql[64 * h + l + 32] >> 4) | (((qh[32 * h + l] >> 6) & 3) << 4)) - 32
                y[n + l] = d * float(sc[8 * h + is_]) * q1
                y[n + l + 32] = d * float(sc[8 * h + is_ + 2]) * q2
                y[n + l + 64] = d * float(sc[8 * h + is_ + 4]) * q3
                y[n + l + 96] = d * float(sc[8 * h + is_ + 6]) * q4
        out.extend(y)
    return np.array(out, np.float32)


def _scalar_q2_k(b):
    out = []
    for i in range(0, len(b), 84):
        scales = b[i : i + 16]
        qs = b[i + 16 : i + 80]
        d = _f16_at(b, i + 80)
        dmin = _f16_at(b, i + 82)
        is_ = 0
        qoff = 0
        for n in range(0, 256, 128):
            shift = 0
            for j in range(4):
                sc = scales[is_]; is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for l in range(16):
                    out.append(dl * ((qs[qoff + l] >> shift) & 3) - ml)
                sc = scales[is_]; is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for l in range(16):
                    out.append(dl * ((qs[qoff + l + 16] >> shift) & 3) - ml)
                shift += 2
            qoff += 32
    return np.array(out, np.float32)


def _scalar_q3_k(b):
    kmask1, kmask2 = 0x03030303, 0x0F0F0F0F
    out = []
    for i in range(0, len(b), 110):
        hmask = b[i : i + 32]
        qs = b[i + 32 : i + 96]
        aux = list(struct.unpack("<3I", b[i + 96 : i + 108]))
        d_all = _f16_at(b, i + 108)
        tmp = aux[2]
        a = [0] * 4
        a[0] = (aux[0] & kmask2) | (((tmp >> 0) & kmask1) << 4)
        a[1] = (aux[1] & kmask2) | (((tmp >> 2) & kmask1) << 4)
        a[2] = ((aux[0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
        a[3] = ((aux[1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
        scales = np.frombuffer(
            struct.pack("<4I", *a), dtype=np.int8
        ).astype(np.int32) - 32
        is_ = 0
        m = 1
        qoff = 0
        for n in range(0, 256, 128):
            shift = 0
            for j in range(4):
                dl = d_all * scales[is_]; is_ += 1
                for l in range(16):
                    q = (qs[qoff + l] >> shift) & 3
                    if not (hmask[l] & m):
                        q -= 4
                    out.append(dl * q)
                dl = d_all * scales[is_]; is_ += 1
                for l in range(16):
                    q = (qs[qoff + l + 16] >> shift) & 3
                    if not (hmask[l + 16] & m):
                        q -= 4
                    out.append(dl * q)
                shift += 2
                m <<= 1
            qoff += 32
    return np.array(out, np.float32)


_SCALAR = {
    GGML_Q8_0: _scalar_q8_0,
    GGML_Q4_0: _scalar_q4_0,
    GGML_Q5_1: _scalar_q5_1,
    GGML_Q4_K: _scalar_q4_k,
    GGML_Q5_K: _scalar_q5_k,
    GGML_Q6_K: _scalar_q6_k,
    GGML_Q2_K: _scalar_q2_k,
    GGML_Q3_K: _scalar_q3_k,
}


def _random_blocks(dtype, n_blocks, seed=0):
    """Random bytes with the f16 scale fields forced finite-small."""
    bk, bb = _BLOCK_BYTES[dtype]
    rs = np.random.RandomState(seed)
    raw = rs.randint(0, 256, size=n_blocks * bb, dtype=np.uint32).astype(np.uint8)
    blocks = raw.reshape(n_blocks, bb)
    # scale f16 fields live in the first 4 bytes for simple quants and
    # Q4_K/Q5_K; Q6_K at 208; Q2_K at 80
    d = np.float16(rs.uniform(0.001, 0.1, size=n_blocks))
    m = np.float16(rs.uniform(0.001, 0.1, size=n_blocks))
    if dtype in (GGML_Q8_0, GGML_Q4_0, GGML_Q5_0):
        blocks[:, 0:2] = d[:, None].view(np.uint8).reshape(n_blocks, 2)
    elif dtype in (GGML_Q4_1, GGML_Q5_1, GGML_Q4_K, GGML_Q5_K):
        blocks[:, 0:2] = d[:, None].view(np.uint8).reshape(n_blocks, 2)
        blocks[:, 2:4] = m[:, None].view(np.uint8).reshape(n_blocks, 2)
    elif dtype == GGML_Q6_K:
        blocks[:, 208:210] = d[:, None].view(np.uint8).reshape(n_blocks, 2)
    elif dtype == GGML_Q2_K:
        blocks[:, 80:82] = d[:, None].view(np.uint8).reshape(n_blocks, 2)
        blocks[:, 82:84] = m[:, None].view(np.uint8).reshape(n_blocks, 2)
    elif dtype == GGML_Q3_K:
        blocks[:, 108:110] = d[:, None].view(np.uint8).reshape(n_blocks, 2)
    return blocks.reshape(-1)


@pytest.mark.parametrize(
    "dtype",
    [GGML_Q8_0, GGML_Q4_0, GGML_Q5_1, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K, GGML_Q2_K, GGML_Q3_K],
)
def test_dequant_matches_scalar_reference(dtype):
    raw = _random_blocks(dtype, n_blocks=5, seed=dtype)
    got = dequantize_ggml(raw, dtype)
    expect = _SCALAR[dtype](bytes(raw))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_q8_0_semantic_roundtrip():
    """Quantize known floats into the documented layout, dequantize back."""
    rs = np.random.RandomState(0)
    w = rs.randn(64).astype(np.float32)
    blocks = []
    for i in range(0, 64, 32):
        chunk = w[i : i + 32]
        d = np.float16(np.abs(chunk).max() / 127.0)
        q = np.clip(np.round(chunk / float(d)), -127, 127).astype(np.int8)
        blocks.append(d.tobytes() + q.tobytes())
    raw = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    got = dequantize_ggml(raw, GGML_Q8_0)
    np.testing.assert_allclose(got, w, atol=0.02)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _gguf_string(s: str) -> bytes:
    e = s.encode()
    return struct.pack("<Q", len(e)) + e


def _kv_str(key, val):
    return _gguf_string(key) + struct.pack("<I", 8) + _gguf_string(val)


def _kv_u32(key, val):
    return _gguf_string(key) + struct.pack("<I", 4) + struct.pack("<I", val)


def _kv_f32(key, val):
    return _gguf_string(key) + struct.pack("<I", 6) + struct.pack("<f", val)


def _write_tiny_gguf(path):
    rs = np.random.RandomState(0)
    embed = rs.randn(16, 8).astype(np.float32)  # ne = [8, 16]
    norm = np.ones(8, dtype=np.float32)
    kv = [
        _kv_str("general.architecture", "qwen3"),
        _kv_u32("qwen3.embedding_length", 8),
        _kv_u32("qwen3.block_count", 2),
        _kv_u32("qwen3.attention.head_count", 2),
        _kv_u32("qwen3.attention.head_count_kv", 1),
        _kv_u32("qwen3.feed_forward_length", 16),
        _kv_u32("qwen3.context_length", 64),
        _kv_u32("qwen3.vocab_size", 16),
        _kv_f32("qwen3.attention.layer_norm_rms_epsilon", 1e-5),
        _kv_f32("qwen3.rope.freq_base", 10000.0),
        _kv_u32("tokenizer.ggml.eos_token_id", 0),
    ]
    tensors = [
        ("token_embd.weight", embed),
        ("output_norm.weight", norm),
    ]
    infos, data = b"", b""
    for name, arr in tensors:
        offset = len(data)
        ne = tuple(reversed(arr.shape))
        infos += (
            _gguf_string(name)
            + struct.pack("<I", len(ne))
            + struct.pack(f"<{len(ne)}Q", *ne)
            + struct.pack("<IQ", GGML_F32, offset)
        )
        data += arr.tobytes()
    header = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors), len(kv))
    body = header + b"".join(kv) + infos
    pad = (-len(body)) % 32
    with open(path, "wb") as f:
        f.write(body + b"\x00" * pad + data)
    return embed, norm


class TestContainer:
    def test_parse_and_read(self, tmp_path):
        p = str(tmp_path / "tiny.gguf")
        embed, norm = _write_tiny_gguf(p)
        g = GGUFFile(p)
        assert g.metadata["general.architecture"] == "qwen3"
        np.testing.assert_array_equal(g.get("token_embd.weight"), embed)
        np.testing.assert_array_equal(g.get("output_norm.weight"), norm)

    def test_config_synthesis(self, tmp_path):
        p = str(tmp_path / "tiny.gguf")
        _write_tiny_gguf(p)
        cfg = config_from_gguf(GGUFFile(p))
        assert cfg.model_type == "qwen3"
        assert cfg.hidden_size == 8
        assert cfg.num_hidden_layers == 2
        assert cfg.num_key_value_heads == 1
        assert cfg.eos_token_ids == (0,)
        assert cfg.tie_word_embeddings  # no output.weight tensor

    def test_statedict_name_mapping(self, tmp_path):
        p = str(tmp_path / "tiny.gguf")
        _write_tiny_gguf(p)
        sd = GGUFStateDict(GGUFFile(p))
        assert "model.embed_tokens.weight" in sd
        assert "model.norm.weight" in sd
        assert sd.get("model.embed_tokens.weight").shape == (16, 8)


def _q8_0_bytes(w: np.ndarray) -> bytes:
    """Quantize a float matrix row-major into Q8_0 blocks."""
    flat = w.reshape(-1).astype(np.float32)
    assert flat.size % 32 == 0
    out = []
    for i in range(0, flat.size, 32):
        chunk = flat[i : i + 32]
        d = np.float16(max(np.abs(chunk).max() / 127.0, 1e-8))
        q = np.clip(np.round(chunk / float(d)), -127, 127).astype(np.int8)
        out.append(d.tobytes() + q.tobytes())
    return b"".join(out)


def _write_full_gguf(path, L=2, D=32, I=64, Hq=2, Hk=2, V=64):
    rs = np.random.RandomState(0)
    Dh = D // Hq
    kv = [
        _kv_str("general.architecture", "llama"),
        _kv_u32("llama.embedding_length", D),
        _kv_u32("llama.block_count", L),
        _kv_u32("llama.attention.head_count", Hq),
        _kv_u32("llama.attention.head_count_kv", Hk),
        _kv_u32("llama.feed_forward_length", I),
        _kv_u32("llama.context_length", 128),
        _kv_u32("llama.vocab_size", V),
        _kv_f32("llama.attention.layer_norm_rms_epsilon", 1e-5),
        _kv_f32("llama.rope.freq_base", 10000.0),
        _kv_u32("tokenizer.ggml.eos_token_id", 0),
    ]
    tensors = [("token_embd.weight", rs.randn(V, D).astype(np.float32) * 0.05, GGML_F32),
               ("output_norm.weight", np.ones(D, np.float32), GGML_F32),
               ("output.weight", rs.randn(V, D).astype(np.float32) * 0.05, GGML_F32)]
    for i in range(L):
        p = f"blk.{i}"
        tensors += [
            (f"{p}.attn_norm.weight", np.ones(D, np.float32), GGML_F32),
            (f"{p}.ffn_norm.weight", np.ones(D, np.float32), GGML_F32),
            (f"{p}.attn_q.weight", rs.randn(Hq * Dh, D).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.attn_k.weight", rs.randn(Hk * Dh, D).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.attn_v.weight", rs.randn(Hk * Dh, D).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.attn_output.weight", rs.randn(D, Hq * Dh).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.ffn_gate.weight", rs.randn(I, D).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.ffn_up.weight", rs.randn(I, D).astype(np.float32) * 0.05, GGML_Q8_0),
            (f"{p}.ffn_down.weight", rs.randn(D, I).astype(np.float32) * 0.05, GGML_Q8_0),
        ]
    infos, data = b"", b""
    for name, arr, dt in tensors:
        pad = (-len(data)) % 32
        data += b"\x00" * pad
        offset = len(data)
        ne = tuple(reversed(arr.shape))
        infos += (_gguf_string(name) + struct.pack("<I", len(ne))
                  + struct.pack(f"<{len(ne)}Q", *ne) + struct.pack("<IQ", dt, offset))
        data += _q8_0_bytes(arr) if dt == GGML_Q8_0 else arr.tobytes()
    header = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors), len(kv))
    body = header + b"".join(kv) + infos
    pad = (-len(body)) % 32
    with open(path, "wb") as f:
        f.write(body + b"\x00" * pad + data)


class TestGGUFEndToEnd:
    def test_load_and_generate(self, tmp_path):
        from vllm_rs_tpu.config import (
            CacheConfig,
            EngineConfig,
            SamplingParams,
            SchedulerConfig,
        )
        from vllm_rs_tpu.core.engine import LLMEngine
        from vllm_rs_tpu.core.runner import ModelRunner
        from vllm_rs_tpu.utils.loader import load_gguf_model

        p = str(tmp_path / "model.gguf")
        _write_full_gguf(p)
        model, params = load_gguf_model(p, quant="int8", quant_group=32, block_size=4)
        assert model.config.model_type == "llama"
        ec = EngineConfig(
            model=model.config,
            cache=CacheConfig(block_size=4, num_blocks=32),
            scheduler=SchedulerConfig(
                max_num_seqs=4, chunk_size=16, max_model_len=64, prefill_buckets=(8, 16)
            ),
            prefill_buckets=(8, 16),
            decode_buckets=(4,),
        )
        engine = LLMEngine(ec, ModelRunner(model, params, ec))
        outs = engine.generate(
            [[3, 4, 5, 6]], SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        )
        assert len(outs[0].output_token_ids) == 5


class TestGGUFTokenizer:
    def test_bpe_reconstruction(self, tmp_path):
        import struct as _s

        from vllm_rs_tpu.utils.gguf import GGUFFile, tokenizer_from_gguf

        # minimal gpt2-style vocab: bytes a, b, c + merge "a b"
        def _arr_str(key, vals):
            out = _gguf_string(key) + _s.pack("<I", 9) + _s.pack("<I", 8) + _s.pack("<Q", len(vals))
            for v in vals:
                out += _gguf_string(v)
            return out

        kv = [
            _kv_str("general.architecture", "llama"),
            _kv_str("tokenizer.ggml.model", "gpt2"),
            _arr_str("tokenizer.ggml.tokens", ["a", "b", "c", "ab"]),
            _arr_str("tokenizer.ggml.merges", ["a b"]),
        ]
        header = _s.pack("<IIQQ", GGUF_MAGIC, 3, 0, len(kv))
        body = header + b"".join(kv)
        p = str(tmp_path / "tok.gguf")
        with open(p, "wb") as f:
            f.write(body + b"\x00" * ((-len(body)) % 32))
        tok = tokenizer_from_gguf(GGUFFile(p))
        ids = tok.encode("ab").ids
        assert ids == [3]  # merged token
        assert tok.decode([0, 1, 2]) == "abc"
