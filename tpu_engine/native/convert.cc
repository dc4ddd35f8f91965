// tpu-engine native host library: GGUF block decoding at load time.
//
// The TPU-native analog of the reference's native host-side quant plumbing
// (ggml's dequantize_row_* family, consumed via the GGUF loader —
// SURVEY.md section 2b "Quant formats"). The compute path stays in
// Pallas/XLA; this library accelerates the model-load hot path: parsing
// ggml block layouts and rewriting them into the unified device format
// (quant/device_format.py), including the group-transposed kernel
// permutation, multithreaded across rows.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in image).
//
// Build: make -C tpu_engine/native   (produces libteconvert.so)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((man & 0x400) == 0) {
        man <<= 1;
        exp--;
      }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000 | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

inline uint16_t load_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}
inline uint32_t load_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

// ggml get_scale_min_k4 (public k-quant layout)
inline void scale_min_k4(int j, const uint8_t* q, uint8_t* d, uint8_t* m) {
  if (j < 4) {
    *d = q[j] & 63;
    *m = q[j + 4] & 63;
  } else {
    *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
    *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
  }
}

// ggml type ids (gguf/constants.py)
enum GType {
  Q4_0 = 2, Q4_1 = 3, Q5_0 = 6, Q5_1 = 7, Q8_0 = 8,
  Q2_K = 10, Q3_K = 11, Q4_K = 12, Q5_K = 13, Q6_K = 14,
};

struct RowSpec {
  int64_t block_bytes;
  int64_t block_elems;
  int group;   // elements per scale group
  bool nib4;   // packed nibbles on device
  bool has_bias;
};

bool row_spec(int ty, RowSpec* rs) {
  switch (ty) {
    case Q4_0: *rs = {18, 32, 32, true, true}; return true;
    case Q4_1: *rs = {20, 32, 32, true, true}; return true;
    case Q5_0: *rs = {22, 32, 32, false, true}; return true;
    case Q5_1: *rs = {24, 32, 32, false, true}; return true;
    case Q8_0: *rs = {34, 32, 32, false, false}; return true;
    case Q2_K: *rs = {84, 256, 16, true, true}; return true;
    case Q3_K: *rs = {110, 256, 16, false, false}; return true;
    case Q4_K: *rs = {144, 256, 32, true, true}; return true;
    case Q5_K: *rs = {176, 256, 32, false, true}; return true;
    case Q6_K: *rs = {210, 256, 16, false, false}; return true;
    default: return false;
  }
}

// Extract one block into natural-order q values (int16 workspace) +
// per-group scale/bias. q_out has block_elems entries; sc/bias have
// block_elems/group entries.
void extract_block(int ty, const uint8_t* b, int16_t* q, float* sc, float* bias) {
  switch (ty) {
    case Q8_0: {
      float d = f16_to_f32(load_u16(b));
      sc[0] = d;
      const int8_t* qs = (const int8_t*)(b + 2);
      for (int j = 0; j < 32; ++j) q[j] = qs[j];
      break;
    }
    case Q4_0: {
      float d = f16_to_f32(load_u16(b));
      sc[0] = d;
      bias[0] = -8.0f * d;
      for (int j = 0; j < 16; ++j) {
        q[j] = b[2 + j] & 0xF;
        q[j + 16] = b[2 + j] >> 4;
      }
      break;
    }
    case Q4_1: {
      float d = f16_to_f32(load_u16(b));
      float m = f16_to_f32(load_u16(b + 2));
      sc[0] = d;
      bias[0] = m;
      for (int j = 0; j < 16; ++j) {
        q[j] = b[4 + j] & 0xF;
        q[j + 16] = b[4 + j] >> 4;
      }
      break;
    }
    case Q5_0: {
      float d = f16_to_f32(load_u16(b));
      uint32_t qh = load_u32(b + 2);
      sc[0] = d;
      bias[0] = 0.0f;
      for (int j = 0; j < 16; ++j) {
        q[j] = (int16_t)(((b[6 + j] & 0xF) | (((qh >> j) & 1) << 4))) - 16;
        q[j + 16] = (int16_t)(((b[6 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4))) - 16;
      }
      break;
    }
    case Q5_1: {
      float d = f16_to_f32(load_u16(b));
      float m = f16_to_f32(load_u16(b + 2));
      uint32_t qh = load_u32(b + 4);
      sc[0] = d;
      bias[0] = m;
      for (int j = 0; j < 16; ++j) {
        q[j] = (b[8 + j] & 0xF) | (((qh >> j) & 1) << 4);
        q[j + 16] = (b[8 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
      }
      break;
    }
    case Q4_K: {
      float d = f16_to_f32(load_u16(b));
      float dmin = f16_to_f32(load_u16(b + 2));
      const uint8_t* scales = b + 4;
      const uint8_t* qs = b + 16;
      for (int c = 0; c < 4; ++c) {
        uint8_t s1, m1, s2, m2;
        scale_min_k4(2 * c, scales, &s1, &m1);
        scale_min_k4(2 * c + 1, scales, &s2, &m2);
        sc[2 * c] = d * s1;
        bias[2 * c] = -dmin * m1;
        sc[2 * c + 1] = d * s2;
        bias[2 * c + 1] = -dmin * m2;
        for (int l = 0; l < 32; ++l) {
          q[64 * c + l] = qs[32 * c + l] & 0xF;
          q[64 * c + 32 + l] = qs[32 * c + l] >> 4;
        }
      }
      break;
    }
    case Q5_K: {
      float d = f16_to_f32(load_u16(b));
      float dmin = f16_to_f32(load_u16(b + 2));
      const uint8_t* scales = b + 4;
      const uint8_t* qh = b + 16;
      const uint8_t* qs = b + 48;
      for (int c = 0; c < 4; ++c) {
        uint8_t s1, m1, s2, m2;
        scale_min_k4(2 * c, scales, &s1, &m1);
        scale_min_k4(2 * c + 1, scales, &s2, &m2);
        sc[2 * c] = d * s1;
        bias[2 * c] = -dmin * m1;
        sc[2 * c + 1] = d * s2;
        bias[2 * c + 1] = -dmin * m2;
        uint8_t u1 = 1 << (2 * c), u2 = 2 << (2 * c);
        for (int l = 0; l < 32; ++l) {
          q[64 * c + l] = (qs[32 * c + l] & 0xF) + ((qh[l] & u1) ? 16 : 0);
          q[64 * c + 32 + l] = (qs[32 * c + l] >> 4) + ((qh[l] & u2) ? 16 : 0);
        }
      }
      break;
    }
    case Q6_K: {
      const uint8_t* ql = b;
      const uint8_t* qh = b + 128;
      const int8_t* scales = (const int8_t*)(b + 192);
      float d = f16_to_f32(load_u16(b + 208));
      for (int g = 0; g < 16; ++g) sc[g] = d * scales[g];
      for (int n = 0; n < 2; ++n) {
        for (int l = 0; l < 32; ++l) {
          int base = 128 * n;
          q[base + l] = (int16_t)((ql[64 * n + l] & 0xF) | (((qh[32 * n + l] >> 0) & 3) << 4)) - 32;
          q[base + 32 + l] = (int16_t)((ql[64 * n + l + 32] & 0xF) | (((qh[32 * n + l] >> 2) & 3) << 4)) - 32;
          q[base + 64 + l] = (int16_t)((ql[64 * n + l] >> 4) | (((qh[32 * n + l] >> 4) & 3) << 4)) - 32;
          q[base + 96 + l] = (int16_t)((ql[64 * n + l + 32] >> 4) | (((qh[32 * n + l] >> 6) & 3) << 4)) - 32;
        }
      }
      break;
    }
    case Q2_K: {
      const uint8_t* scales = b;
      const uint8_t* qs = b + 16;
      float d = f16_to_f32(load_u16(b + 80));
      float dmin = f16_to_f32(load_u16(b + 82));
      for (int g = 0; g < 16; ++g) {
        sc[g] = d * (scales[g] & 0xF);
        bias[g] = -dmin * (scales[g] >> 4);
      }
      for (int n = 0; n < 2; ++n)
        for (int j = 0; j < 4; ++j)
          for (int l = 0; l < 32; ++l)
            q[128 * n + 32 * j + l] = (qs[32 * n + l] >> (2 * j)) & 3;
      break;
    }
    case Q3_K: {
      const uint8_t* hmask = b;
      const uint8_t* qs = b + 32;
      const uint8_t* s = b + 96;
      float d = f16_to_f32(load_u16(b + 108));
      for (int j = 0; j < 16; ++j) {
        int lo4 = (j < 8) ? (s[j] & 0xF) : (s[j - 8] >> 4);
        int hi2 = (s[8 + (j % 4)] >> (2 * (j / 4))) & 3;
        sc[j] = d * ((lo4 | (hi2 << 4)) - 32);
      }
      int m = 1;
      for (int n = 0; n < 2; ++n) {
        for (int j = 0; j < 4; ++j) {
          for (int l = 0; l < 32; ++l) {
            int v = (qs[32 * n + l] >> (2 * j)) & 3;
            if (!(hmask[l] & m)) v -= 4;
            q[128 * n + 32 * j + l] = (int16_t)v;
          }
          m <<= 1;
        }
      }
      break;
    }
  }
}

void process_rows(int ty, const RowSpec& rs, const uint8_t* raw, int64_t k,
                  int shards, uint8_t* qs_out, float* sc_out, float* bias_out,
                  int64_t row_begin, int64_t row_end) {
  const int64_t blocks_per_row = k / rs.block_elems;
  const int64_t row_bytes = blocks_per_row * rs.block_bytes;
  const int G = rs.group;
  const int64_t ng = k / G;
  const int64_t groups_per_block = rs.block_elems / G;
  // shards > 1: group-transpose each of `shards` contiguous K-chunks
  // independently so the tensor can shard along K under tensor parallelism
  // (quant/device_format.py permute_*(..., shards)).
  const int64_t kc = k / shards;   // chunk elements (multiple of G)
  const int64_t ngc = kc / G;      // groups per chunk
  std::vector<int16_t> qnat(k);
  for (int64_t r = row_begin; r < row_end; ++r) {
    const uint8_t* rowp = raw + r * row_bytes;
    float* sc_row = sc_out + r * ng;
    float* bias_row = bias_out ? bias_out + r * ng : nullptr;
    float bias_dummy[16];
    for (int64_t blk = 0; blk < blocks_per_row; ++blk) {
      extract_block(ty, rowp + blk * rs.block_bytes,
                    qnat.data() + blk * rs.block_elems,
                    sc_row + blk * groups_per_block,
                    bias_row ? bias_row + blk * groups_per_block : bias_dummy);
    }
    // group-transposed kernel layout (quant/device_format.py)
    if (rs.nib4) {
      for (int64_t c = 0; c < shards; ++c) {
        const int16_t* qc = qnat.data() + c * kc;
        uint8_t* out = qs_out + r * (k / 2) + c * (kc / 2);
        for (int r2 = 0; r2 < G / 2; ++r2) {
          for (int64_t g = 0; g < ngc; ++g) {
            uint8_t lo = (uint8_t)qc[g * G + 2 * r2] & 0xF;
            uint8_t hi = (uint8_t)qc[g * G + 2 * r2 + 1] & 0xF;
            out[r2 * ngc + g] = lo | (hi << 4);
          }
        }
      }
    } else {
      for (int64_t c = 0; c < shards; ++c) {
        const int16_t* qc = qnat.data() + c * kc;
        int8_t* out = (int8_t*)qs_out + r * k + c * kc;
        for (int rr = 0; rr < G; ++rr)
          for (int64_t g = 0; g < ngc; ++g)
            out[rr * ngc + g] = (int8_t)qc[g * G + rr];
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. qs_out: [n_rows, k/2] (nib4) or [n_rows, k] (i8);
// sc_out/bias_out: [n_rows, k/group] f32 (bias_out may be null for
// symmetric formats). shards: number of independent K-chunks for the
// kernel-layout permutation (1 = whole row; >1 = TP row-parallel layout).
int te_extract_device(int ggml_type, const uint8_t* raw, int64_t n_rows,
                      int64_t k, uint8_t* qs_out, float* sc_out,
                      float* bias_out, int n_threads, int shards) {
  RowSpec rs;
  if (!row_spec(ggml_type, &rs)) return 1;
  if (k % rs.block_elems != 0) return 2;
  if (shards < 1) shards = 1;
  if (k % shards != 0 || (k / shards) % rs.group != 0) return 3;
  if (rs.nib4 && (k / shards) % 2 != 0) return 3;
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || n_rows < 4) {
    process_rows(ggml_type, rs, raw, k, shards, qs_out, sc_out, bias_out,
                 0, n_rows);
    return 0;
  }
  std::vector<std::thread> workers;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
    if (lo >= hi) break;
    workers.emplace_back(process_rows, ggml_type, std::cref(rs), raw, k,
                         shards, qs_out, sc_out, bias_out, lo, hi);
  }
  for (auto& w : workers) w.join();
  return 0;
}

// Full dequantization to f32 (row-major), multithreaded.
int te_dequant(int ggml_type, const uint8_t* raw, int64_t n_rows, int64_t k,
               float* out, int n_threads) {
  RowSpec rs;
  if (!row_spec(ggml_type, &rs)) return 1;
  if (k % rs.block_elems != 0) return 2;
  if (n_threads < 1) n_threads = 1;

  auto run = [&](int64_t lo, int64_t hi) {
    const int64_t blocks_per_row = k / rs.block_elems;
    const int64_t row_bytes = blocks_per_row * rs.block_bytes;
    const int G = rs.group;
    const int64_t groups_per_block = rs.block_elems / G;
    std::vector<int16_t> qnat(rs.block_elems);
    std::vector<float> sc(groups_per_block), bias(groups_per_block, 0.0f);
    for (int64_t r = lo; r < hi; ++r) {
      const uint8_t* rowp = raw + r * row_bytes;
      float* orow = out + r * k;
      for (int64_t blk = 0; blk < blocks_per_row; ++blk) {
        std::memset(bias.data(), 0, bias.size() * 4);
        extract_block(ggml_type, rowp + blk * rs.block_bytes, qnat.data(),
                      sc.data(), bias.data());
        for (int64_t e = 0; e < rs.block_elems; ++e) {
          int64_t g = e / G;
          orow[blk * rs.block_elems + e] = qnat[e] * sc[g] + bias[g];
        }
      }
    }
  };
  if (n_threads == 1 || n_rows < 4) {
    run(0, n_rows);
    return 0;
  }
  std::vector<std::thread> workers;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
    if (lo >= hi) break;
    workers.emplace_back(run, lo, hi);
  }
  for (auto& w : workers) w.join();
  return 0;
}

}  // extern "C"
