// tpuzip host runtime — native C++ implementations of the host-side paths:
// container framing, checksums, and CPU codec baselines (LZ4 block, RLE,
// carryless range coder).  These mirror tpuzip.oracle formats bit-exactly
// and exist so host assembly/IO runs at memcpy speed and so bench.py has an
// honest single-thread CPU baseline for codecs with no system library.
//
// Build: make -C csrc   (produces libtpuzip_host.so; loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- adler32
uint32_t tpz_adler32(const uint8_t* data, int64_t n, uint32_t start) {
  const uint32_t MOD = 65521;
  uint32_t s1 = start & 0xFFFF, s2 = (start >> 16) & 0xFFFF;
  int64_t i = 0;
  while (i < n) {
    int64_t end = i + 5552 < n ? i + 5552 : n;
    for (; i < end; ++i) {
      s1 += data[i];
      s2 += s1;
    }
    s1 %= MOD;
    s2 %= MOD;
  }
  return (s2 << 16) | s1;
}

// ---------------------------------------------------------------- xxh32
static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}

uint32_t tpz_xxh32(const uint8_t* p, int64_t n, uint32_t seed) {
  const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;
  const uint8_t* end = p + n;
  uint32_t h;
  if (n >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      uint32_t lane;
#define ROUND(v)                 \
  memcpy(&lane, p, 4);           \
  v = rotl32(v + lane * P2, 13) * P1; \
  p += 4;
      ROUND(v1) ROUND(v2) ROUND(v3) ROUND(v4)
#undef ROUND
    } while (p <= limit);
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)n;
  while (p + 4 <= end) {
    uint32_t lane;
    memcpy(&lane, p, 4);
    h = rotl32(h + lane * P3, 17) * P4;
    p += 4;
  }
  while (p < end) h = rotl32(h + (*p++) * P5, 11) * P1;
  h ^= h >> 15;
  h *= P2;
  h ^= h >> 13;
  h *= P3;
  h ^= h >> 16;
  return h;
}

// ---------------------------------------------------------------- LZ4 block
// Greedy single-probe hash encoder, same policy/format as tpuzip.oracle.lz4.
int64_t tpz_lz4_compress(const uint8_t* src, int64_t n, uint8_t* dst,
                         int64_t cap) {
  const int HASH_LOG = 16;
  const int64_t MFLIMIT = 12, LASTLIT = 5;
  if (n == 0) {
    if (cap < 1) return -1;
    dst[0] = 0;
    return 1;
  }
  std::vector<int64_t> table((size_t)1 << HASH_LOG, -1);
  int64_t anchor = 0, i = 0, o = 0;
  int64_t limit = n - MFLIMIT > 0 ? n - MFLIMIT : 0;
  auto emit_len = [&](int64_t len) {
    int64_t rem = len - 15;
    while (rem >= 255) {
      dst[o++] = 255;
      rem -= 255;
    }
    dst[o++] = (uint8_t)rem;
  };
  while (i < limit) {
    uint32_t seq;
    memcpy(&seq, src + i, 4);
    uint32_t h = (seq * 2654435761u) >> (32 - HASH_LOG);
    int64_t cand = table[h];
    table[h] = i;
    if (cand >= 0 && i - cand <= 0xFFFF &&
        memcmp(src + cand, src + i, 4) == 0) {
      int64_t m = i + 4, c = cand + 4, end = n - LASTLIT;
      while (m < end && src[m] == src[c]) {
        ++m;
        ++c;
      }
      int64_t mlen = m - i, lit = i - anchor;
      int64_t ml = mlen - 4;
      // worst case: token + lit-ext + literals + offset + match-ext bytes
      if (o + lit + 16 + lit / 255 + ml / 255 + 1 > cap) return -1;
      dst[o++] = (uint8_t)(((lit < 15 ? lit : 15) << 4) |
                           (ml < 15 ? ml : 15));
      if (lit >= 15) emit_len(lit);
      memcpy(dst + o, src + anchor, (size_t)lit);
      o += lit;
      uint16_t off = (uint16_t)(i - cand);
      memcpy(dst + o, &off, 2);
      o += 2;
      if (ml >= 15) emit_len(ml);
      i = m;
      anchor = m;
    } else {
      ++i;
    }
  }
  int64_t lit = n - anchor;
  if (o + lit + 1 + lit / 255 + 1 > cap) return -1;
  dst[o++] = (uint8_t)((lit < 15 ? lit : 15) << 4);
  if (lit >= 15) emit_len(lit);
  memcpy(dst + o, src + anchor, (size_t)lit);
  o += lit;
  return o;
}

int64_t tpz_lz4_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                           int64_t cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    uint8_t token = src[i++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n || o + lit > cap) return -1;
    memcpy(dst + o, src + i, (size_t)lit);
    i += lit;
    o += lit;
    if (i >= n) break;
    if (i + 2 > n) return -1;
    uint16_t off;
    memcpy(&off, src + i, 2);
    i += 2;
    if (off == 0 || off > o) return -1;
    int64_t mlen = (token & 0xF) + 4;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    if (o + mlen > cap) return -1;
    int64_t s = o - off;
    for (int64_t k = 0; k < mlen; ++k) dst[o + k] = dst[s + k];
    o += mlen;
  }
  return o;
}

// LZ4 decode PLAN: parse the token stream at host speed and emit, for
// every output byte, the position of the compressed-stream LITERAL it
// ultimately copies from (matches resolved transitively, overlap included).
// The device then decodes with ONE bulk gather out[i] = comp[plan[i]] —
// the host-parse/device-copy-plan architecture (GPU-decoder style).
int64_t tpz_lz4_decode_plan(const uint8_t* src, int64_t n, int32_t* plan,
                            int64_t cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    uint8_t token = src[i++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n || o + lit > cap) return -1;
    for (int64_t k = 0; k < lit; ++k) plan[o + k] = (int32_t)(i + k);
    i += lit;
    o += lit;
    if (i >= n) break;
    if (i + 2 > n) return -1;
    uint16_t off;
    memcpy(&off, src + i, 2);
    i += 2;
    if (off == 0 || off > o) return -1;
    int64_t mlen = (token & 0xF) + 4;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (i >= n) return -1;
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    if (o + mlen > cap) return -1;
    int64_t s = o - off;
    // transitive resolution: plan[s+k] is already a literal position
    // (overlapping matches read entries written earlier this iteration)
    for (int64_t k = 0; k < mlen; ++k) plan[o + k] = plan[s + k];
    o += mlen;
  }
  return o;
}

// ---------------------------------------------------------------- RLE
int64_t tpz_rle_encode(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t cap) {
  int64_t i = 0, o = 0;
  while (i < n) {
    uint8_t b = src[i];
    int64_t run = 1;
    while (i + run < n && src[i + run] == b) ++run;
    if (run == 1) {
      if (o + 1 > cap) return -1;
      dst[o++] = b;
      ++i;
    } else {
      int64_t rem = run - 2;
      if (o + 2 + rem / 255 + 1 > cap) return -1;
      dst[o++] = b;
      dst[o++] = b;
      while (rem >= 255) {
        dst[o++] = 255;
        rem -= 255;
      }
      dst[o++] = (uint8_t)rem;
      i += run;
    }
  }
  return o;
}

int64_t tpz_rle_decode(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t cap) {
  int64_t i = 0, o = 0;
  int prev = -1;
  while (i < n) {
    uint8_t b = src[i++];
    if (o + 1 > cap) return -1;
    dst[o++] = b;
    if (b == prev) {
      int64_t extra = 0;
      uint8_t c;
      do {
        if (i >= n) return -1;
        c = src[i++];
        extra += c;
      } while (c == 255);
      if (o + extra > cap) return -1;
      memset(dst + o, b, (size_t)extra);
      o += extra;
      prev = -1;
    } else {
      prev = b;
    }
  }
  return o;
}

// ------------------------------------------------- carryless range coder
// Same coder + order-0 table model as tpuzip.oracle.ari (bit-exact).
struct AriModel {
  uint32_t freq[256];
  uint32_t total;
  uint32_t inc, thresh;
  void init(uint32_t increment, uint32_t threshold) {
    for (int s = 0; s < 256; ++s) freq[s] = 1;
    total = 256;
    inc = increment;
    thresh = threshold;
  }
  void update(int sym) {
    freq[sym] += inc;
    total += inc;
    if (total >= thresh) {
      total = 0;
      for (int s = 0; s < 256; ++s) {
        freq[s] = (freq[s] + 1) >> 1;
        total += freq[s];
      }
    }
  }
};

static const uint32_t A_TOP = 1u << 24, A_BOT = 1u << 16;

int64_t tpz_ari_encode(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t cap, uint32_t increment, uint32_t threshold) {
  AriModel m;
  m.init(increment, threshold);
  uint32_t low = 0, range = 0xFFFFFFFFu;
  int64_t o = 0;
  for (int64_t i = 0; i < n; ++i) {
    int sym = src[i];
    uint32_t cumlo = 0;
    for (int s = 0; s < sym; ++s) cumlo += m.freq[s];
    uint32_t r = range / m.total;
    low += r * cumlo;
    range = r * m.freq[sym];
    for (;;) {
      if (((low ^ (low + range)) < A_TOP)) {
      } else if (range < A_BOT) {
        range = (uint32_t)(-(int64_t)low) & (A_BOT - 1);
      } else {
        break;
      }
      if (o >= cap) return -1;
      dst[o++] = (uint8_t)(low >> 24);
      low <<= 8;
      range <<= 8;
    }
    m.update(sym);
  }
  for (int k = 0; k < 4; ++k) {
    if (o >= cap) return -1;
    dst[o++] = (uint8_t)(low >> 24);
    low <<= 8;
  }
  return o;
}

int64_t tpz_ari_decode(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t num_syms, uint32_t increment,
                       uint32_t threshold) {
  AriModel m;
  m.init(increment, threshold);
  uint32_t low = 0, range = 0xFFFFFFFFu, code = 0;
  int64_t i = 0;
  for (int k = 0; k < 4; ++k) code = (code << 8) | (i < n ? src[i++] : 0);
  for (int64_t t = 0; t < num_syms; ++t) {
    uint32_t r = range / m.total;
    uint32_t v = (code - low) / r;
    if (v >= m.total) v = m.total - 1;
    uint32_t acc = 0;
    int sym = 0;
    while (acc + m.freq[sym] <= v) acc += m.freq[sym++];
    dst[t] = (uint8_t)sym;
    low += r * acc;
    range = r * m.freq[sym];
    for (;;) {
      if (((low ^ (low + range)) < A_TOP)) {
      } else if (range < A_BOT) {
        range = (uint32_t)(-(int64_t)low) & (A_BOT - 1);
      } else {
        break;
      }
      code = (code << 8) | (i < n ? src[i++] : 0);
      low <<= 8;
      range <<= 8;
    }
    m.update(sym);
  }
  return num_syms;
}

// ------------------------------------------------- container assembly
// Gather B ragged payload rows of a (B, cap) matrix into one stream.
int64_t tpz_pack_payloads(const uint8_t* comp, int64_t b, int64_t cap,
                          const int32_t* lens, uint8_t* dst,
                          int64_t dst_cap) {
  int64_t o = 0;
  for (int64_t i = 0; i < b; ++i) {
    int64_t l = lens[i];
    if (o + l > dst_cap) return -1;
    memcpy(dst + o, comp + i * cap, (size_t)l);
    o += l;
  }
  return o;
}

// Scatter a packed stream back into fixed rows.
int64_t tpz_unpack_payloads(const uint8_t* stream, int64_t stream_len,
                            const int32_t* lens, int64_t b, uint8_t* comp,
                            int64_t cap) {
  int64_t o = 0;
  for (int64_t i = 0; i < b; ++i) {
    int64_t l = lens[i];
    if (l > cap || o + l > stream_len) return -1;
    memcpy(comp + i * cap, stream + o, (size_t)l);
    o += l;
  }
  return o;
}

}  // extern "C"
