// Native GGML block dequantization + prefix-cache hashing.
//
// C++ counterpart of the reference's native data-path crates: the GGUF
// K-quant decode that candle/attention-rs do natively (SURVEY.md §2.5/2.6)
// runs here at memcpy-like speed instead of through numpy temporaries, and
// the prefix-cache chain hash (reference prefix_cache.rs:343-348) is a
// 64-bit FNV-1a chain over block token windows.
//
// Layouts follow the public GGUF spec (ggml-org/ggml docs/gguf.md); the
// Python fallbacks in vllm_rs_tpu/utils/gguf.py implement the identical
// formulas and the test suite cross-checks both.
//
// Build: g++ -O3 -march=native -shared -fPIC gguf_dequant.cpp -o libvllm_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t out;
    if (exp == 0) {
        if (mant == 0) {
            out = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; --exp; }
            mant &= 0x3FF;
            out = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        out = sign | 0x7F800000u | (mant << 13);
    } else {
        out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

inline void get_scale_min_k4(int j, const uint8_t* s, float* sc, float* mn) {
    if (j < 4) {
        *sc = (float)(s[j] & 63);
        *mn = (float)(s[j + 4] & 63);
    } else {
        *sc = (float)((s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4));
        *mn = (float)((s[j + 4] >> 4) | ((s[j] >> 6) << 4));
    }
}

}  // namespace

extern "C" {

// ---- simple quants (block = 32 values) ------------------------------------

void dequant_q8_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 34;
        float d = f16_to_f32(*(const uint16_t*)p);
        const int8_t* q = (const int8_t*)(p + 2);
        float* y = out + b * 32;
        for (int i = 0; i < 32; ++i) y[i] = d * q[i];
    }
}

void dequant_q4_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 18;
        float d = f16_to_f32(*(const uint16_t*)p);
        const uint8_t* q = p + 2;
        float* y = out + b * 32;
        for (int i = 0; i < 16; ++i) {
            y[i] = d * (float)((int)(q[i] & 0xF) - 8);
            y[i + 16] = d * (float)((int)(q[i] >> 4) - 8);
        }
    }
}

void dequant_q4_1(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 20;
        float d = f16_to_f32(*(const uint16_t*)p);
        float m = f16_to_f32(*(const uint16_t*)(p + 2));
        const uint8_t* q = p + 4;
        float* y = out + b * 32;
        for (int i = 0; i < 16; ++i) {
            y[i] = d * (float)(q[i] & 0xF) + m;
            y[i + 16] = d * (float)(q[i] >> 4) + m;
        }
    }
}

void dequant_q5_0(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 22;
        float d = f16_to_f32(*(const uint16_t*)p);
        uint32_t qh;
        std::memcpy(&qh, p + 2, 4);
        const uint8_t* q = p + 6;
        float* y = out + b * 32;
        for (int i = 0; i < 16; ++i) {
            int xh0 = ((qh >> i) << 4) & 0x10;
            int xh1 = (qh >> (i + 12)) & 0x10;
            y[i] = d * (float)(((int)(q[i] & 0xF) | xh0) - 16);
            y[i + 16] = d * (float)(((int)(q[i] >> 4) | xh1) - 16);
        }
    }
}

void dequant_q5_1(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 24;
        float d = f16_to_f32(*(const uint16_t*)p);
        float m = f16_to_f32(*(const uint16_t*)(p + 2));
        uint32_t qh;
        std::memcpy(&qh, p + 4, 4);
        const uint8_t* q = p + 8;
        float* y = out + b * 32;
        for (int i = 0; i < 16; ++i) {
            int xh0 = ((qh >> i) << 4) & 0x10;
            int xh1 = (qh >> (i + 12)) & 0x10;
            y[i] = d * (float)((int)(q[i] & 0xF) | xh0) + m;
            y[i + 16] = d * (float)((int)(q[i] >> 4) | xh1) + m;
        }
    }
}

// ---- K-quants (super-block = 256 values) -----------------------------------

void dequant_q4_k(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 144;
        float d = f16_to_f32(*(const uint16_t*)p);
        float dmin = f16_to_f32(*(const uint16_t*)(p + 2));
        const uint8_t* scales = p + 4;
        const uint8_t* q = p + 16;
        float* y = out + b * 256;
        int is = 0;
        for (int j = 0; j < 256; j += 64) {
            float sc1, m1, sc2, m2;
            get_scale_min_k4(is + 0, scales, &sc1, &m1);
            get_scale_min_k4(is + 1, scales, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l) *y++ = d1 * (q[l] & 0xF) - mm1;
            for (int l = 0; l < 32; ++l) *y++ = d2 * (q[l] >> 4) - mm2;
            q += 32;
            is += 2;
        }
    }
}

void dequant_q5_k(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 176;
        float d = f16_to_f32(*(const uint16_t*)p);
        float dmin = f16_to_f32(*(const uint16_t*)(p + 2));
        const uint8_t* scales = p + 4;
        const uint8_t* qh = p + 16;
        const uint8_t* ql = p + 48;
        float* y = out + b * 256;
        int is = 0;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < 256; j += 64) {
            float sc1, m1, sc2, m2;
            get_scale_min_k4(is + 0, scales, &sc1, &m1);
            get_scale_min_k4(is + 1, scales, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l)
                *y++ = d1 * ((ql[l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - mm1;
            for (int l = 0; l < 32; ++l)
                *y++ = d2 * ((ql[l] >> 4) + ((qh[l] & u2) ? 16 : 0)) - mm2;
            ql += 32;
            is += 2;
            u1 <<= 2;
            u2 <<= 2;
        }
    }
}

void dequant_q6_k(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 210;
        const uint8_t* ql = p;
        const uint8_t* qh = p + 128;
        const int8_t* sc = (const int8_t*)(p + 192);
        float d = f16_to_f32(*(const uint16_t*)(p + 208));
        float* y = out + b * 256;
        for (int n = 0; n < 256; n += 128) {
            int h = n / 128;
            for (int l = 0; l < 32; ++l) {
                int is = l / 16;
                int q1 = ((ql[64 * h + l] & 0xF) | (((qh[32 * h + l] >> 0) & 3) << 4)) - 32;
                int q2 = ((ql[64 * h + l + 32] & 0xF) | (((qh[32 * h + l] >> 2) & 3) << 4)) - 32;
                int q3 = ((ql[64 * h + l] >> 4) | (((qh[32 * h + l] >> 4) & 3) << 4)) - 32;
                int q4 = ((ql[64 * h + l + 32] >> 4) | (((qh[32 * h + l] >> 6) & 3) << 4)) - 32;
                y[n + l] = d * sc[8 * h + is] * q1;
                y[n + l + 32] = d * sc[8 * h + is + 2] * q2;
                y[n + l + 64] = d * sc[8 * h + is + 4] * q3;
                y[n + l + 96] = d * sc[8 * h + is + 6] * q4;
            }
        }
    }
}

void dequant_q2_k(const uint8_t* in, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 84;
        const uint8_t* scales = p;
        const uint8_t* q = p + 16;
        float d = f16_to_f32(*(const uint16_t*)(p + 80));
        float dmin = f16_to_f32(*(const uint16_t*)(p + 82));
        float* y = out + b * 256;
        int is = 0;
        for (int n = 0; n < 256; n += 128) {
            int shift = 0;
            for (int j = 0; j < 4; ++j) {
                uint8_t sc = scales[is++];
                float dl = d * (sc & 0xF), ml = dmin * (sc >> 4);
                for (int l = 0; l < 16; ++l) *y++ = dl * ((q[l] >> shift) & 3) - ml;
                sc = scales[is++];
                dl = d * (sc & 0xF); ml = dmin * (sc >> 4);
                for (int l = 0; l < 16; ++l) *y++ = dl * ((q[l + 16] >> shift) & 3) - ml;
                shift += 2;
            }
            q += 32;
        }
    }
}

void dequant_q3_k(const uint8_t* in, float* out, int64_t n_blocks) {
    const uint32_t kmask1 = 0x03030303, kmask2 = 0x0F0F0F0F;
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* p = in + b * 110;
        const uint8_t* hm = p;
        const uint8_t* q = p + 32;
        uint32_t aux[4];
        std::memcpy(aux, p + 96, 12);
        float d_all = f16_to_f32(*(const uint16_t*)(p + 108));
        uint32_t tmp = aux[2];
        aux[2] = ((aux[0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4);
        aux[3] = ((aux[1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4);
        aux[0] = (aux[0] & kmask2) | (((tmp >> 0) & kmask1) << 4);
        aux[1] = (aux[1] & kmask2) | (((tmp >> 2) & kmask1) << 4);
        const int8_t* scales = (const int8_t*)aux;
        float* y = out + b * 256;
        int is = 0;
        uint8_t m = 1;
        for (int n = 0; n < 256; n += 128) {
            int shift = 0;
            for (int j = 0; j < 4; ++j) {
                float dl = d_all * (scales[is++] - 32);
                for (int l = 0; l < 16; ++l) {
                    int v = (q[l] >> shift) & 3;
                    if (!(hm[l] & m)) v -= 4;
                    *y++ = dl * v;
                }
                dl = d_all * (scales[is++] - 32);
                for (int l = 0; l < 16; ++l) {
                    int v = (q[l + 16] >> shift) & 3;
                    if (!(hm[l + 16] & m)) v -= 4;
                    *y++ = dl * v;
                }
                shift += 2;
                m <<= 1;
            }
            q += 32;
        }
    }
}

void dequant_f16(const uint8_t* in, float* out, int64_t n) {
    const uint16_t* h = (const uint16_t*)in;
    for (int64_t i = 0; i < n; ++i) out[i] = f16_to_f32(h[i]);
}

void dequant_bf16(const uint8_t* in, float* out, int64_t n) {
    const uint16_t* h = (const uint16_t*)in;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t u = (uint32_t)h[i] << 16;
        std::memcpy(&out[i], &u, 4);
    }
}

// ---- prefix-cache chain hashing --------------------------------------------
// 64-bit FNV-1a chained per block: h_i = fnv(h_{i-1} || tokens[block_i])
// (reference prefix_cache.rs:343-348; the seed folds in image hashes for VL
// prompts, block_manager.rs:146-177).

void hash_token_blocks(
    const int32_t* tokens, int64_t n_tokens, int32_t block_size,
    uint64_t seed, uint64_t* out_hashes /* [n_tokens / block_size] */) {
    const uint64_t FNV_OFFSET = 1469598103934665603ULL;
    const uint64_t FNV_PRIME = 1099511628211ULL;
    uint64_t parent = seed ? seed : FNV_OFFSET;
    int64_t n_blocks = n_tokens / block_size;
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint64_t h = FNV_OFFSET;
        // chain in the parent hash
        for (int i = 0; i < 8; ++i) {
            h ^= (parent >> (8 * i)) & 0xFF;
            h *= FNV_PRIME;
        }
        const int32_t* blk = tokens + b * block_size;
        for (int32_t t = 0; t < block_size; ++t) {
            uint32_t v = (uint32_t)blk[t];
            for (int i = 0; i < 4; ++i) {
                h ^= (v >> (8 * i)) & 0xFF;
                h *= FNV_PRIME;
            }
        }
        out_hashes[b] = h;
        parent = h;
    }
}

}  // extern "C"
