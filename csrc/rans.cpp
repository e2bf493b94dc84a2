// rANS entropy coder for the TPU camera-imaging engine.
//
// TPU-native equivalent of the compiled range coder the reference stack
// depends on (CompressAI `BufferedRansEncoder`/`RansDecoder`, used at
// reference tcm.py:531-567,606-623 and raw2bit.py:1921-1958,1996-2023).
// Runs on the host CPU after the device pass; exposed to Python via ctypes
// (no pybind11 in this image).
//
// Scheme: byte-oriented rANS, 32-bit state, 16-bit probability precision.
// Out-of-range symbols escape to the table's final slot and append their
// overflow with bypass (uniform) coding in 4-bit chunks, so any int32 symbol
// round-trips. Encoding walks the symbol list in reverse so a streaming
// decoder reads the byte stream forward slice by slice (required by the
// ChARM decode loop's 5 device<->host round trips, SURVEY.md §3.4).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint32_t kProbScale = 1u << kPrecision;
constexpr uint32_t kLow = 1u << 23;  // renorm interval [kLow, kLow << 8)
constexpr int kBypassBits = 4;
constexpr uint32_t kBypassMax = (1u << kBypassBits) - 1;

class Encoder {
 public:
  std::vector<uint8_t> bytes;  // produced back-to-front; reversed at flush
  uint32_t s = kLow;

  inline void put(uint32_t start, uint32_t freq) {
    const uint32_t x_max = ((kLow >> kPrecision) << 8) * freq;
    while (s >= x_max) {
      bytes.push_back(static_cast<uint8_t>(s & 0xff));
      s >>= 8;
    }
    s = ((s / freq) << kPrecision) + (s % freq) + start;
  }

  inline void put_bypass(uint32_t val) {  // val < 2^kBypassBits
    put(val << (kPrecision - kBypassBits), kProbScale >> kBypassBits);
  }

  void flush(std::vector<uint8_t>* out) {
    for (int i = 0; i < 4; ++i) {
      bytes.push_back(static_cast<uint8_t>(s & 0xff));
      s >>= 8;
    }
    out->assign(bytes.rbegin(), bytes.rend());
  }
};

class Decoder {
 public:
  std::vector<uint8_t> bytes;
  size_t pos = 0;
  uint32_t s = 0;

  void init(const uint8_t* data, size_t n) {
    bytes.assign(data, data + n);
    pos = 0;
    s = 0;
    for (int i = 0; i < 4; ++i) {
      s = (s << 8) | (pos < bytes.size() ? bytes[pos++] : 0);
    }
  }

  inline uint32_t peek() const { return s & (kProbScale - 1); }

  inline void advance(uint32_t start, uint32_t freq) {
    s = freq * (s >> kPrecision) + (s & (kProbScale - 1)) - start;
    while (s < kLow) {
      s = (s << 8) | (pos < bytes.size() ? bytes[pos++] : 0);
    }
  }

  inline uint32_t get_bypass() {
    const uint32_t val = peek() >> (kPrecision - kBypassBits);
    advance(val << (kPrecision - kBypassBits), kProbScale >> kBypassBits);
    return val;
  }
};

}  // namespace

extern "C" {

// Encode n symbols. cdfs: (num_tables, cdf_stride) row-major quantized CDFs;
// for table t, cdf[0]=0 .. cdf[L-1]=2^16 with L = cdf_lengths[t]; bucket
// L-2 is the escape slot. offsets[t] maps symbol -> bucket.
// Returns bytes written, or -1 if capacity was insufficient.
int64_t rans_encode_with_indexes(
    const int32_t* symbols, const int32_t* indexes, int64_t n,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, uint8_t* out, int64_t capacity) {
  Encoder enc;
  enc.bytes.reserve(static_cast<size_t>(n) * 2 + 16);

  // rANS encodes in reverse symbol order; within one symbol, ops are emitted
  // in reverse of the decoder's read order.
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t t = indexes[i];
    const uint32_t* cdf = cdfs + t * cdf_stride;
    const int64_t max_value = cdf_lengths[t] - 2;
    int64_t value = static_cast<int64_t>(symbols[i]) - offsets[t];
    int64_t raw = -1;
    if (value < 0) {
      raw = -2 * value - 1;
      value = max_value;
    } else if (value >= max_value) {
      raw = 2 * (value - max_value);
      value = max_value;
    }

    if (raw >= 0) {
      // Decoder reads: count chunks (sum until chunk < kBypassMax), then
      // payload chunks high-to-low. Encoder emits the exact reverse:
      // payload low-to-high, then count terminator, then full count chunks.
      const uint64_t uraw = static_cast<uint64_t>(raw);
      int n_chunks = 0;
      uint64_t tmp = uraw;
      do {
        ++n_chunks;
        tmp >>= kBypassBits;
      } while (tmp != 0);
      for (int c = 0; c < n_chunks; ++c) {
        enc.put_bypass(static_cast<uint32_t>((uraw >> (c * kBypassBits)) & kBypassMax));
      }
      const int32_t cnt = n_chunks - 1;
      enc.put_bypass(static_cast<uint32_t>(cnt % static_cast<int32_t>(kBypassMax)));
      for (int c = 0; c < cnt / static_cast<int32_t>(kBypassMax); ++c) {
        enc.put_bypass(kBypassMax);
      }
    }

    const uint32_t start = cdf[value];
    const uint32_t freq = cdf[value + 1] - start;
    enc.put(start, freq);
  }

  std::vector<uint8_t> out_vec;
  enc.flush(&out_vec);
  if (static_cast<int64_t>(out_vec.size()) > capacity) return -1;
  std::memcpy(out, out_vec.data(), out_vec.size());
  return static_cast<int64_t>(out_vec.size());
}

void* rans_decoder_new(const uint8_t* data, int64_t n) {
  Decoder* d = new Decoder();
  d->init(data, static_cast<size_t>(n));
  return d;
}

void rans_decoder_free(void* handle) { delete static_cast<Decoder*>(handle); }

// Decode n symbols with per-symbol table indexes; streaming (the handle keeps
// rANS state between calls so the ChARM loop can interleave device work).
//
// Symbol lookup uses a lazily-built per-table LUT over the top kLutBits of
// the rANS slot (cum): lut[b] = largest v with cdf[v] <= (b << shift), then a
// short forward scan. This replaces a log2(L) binary search per symbol
// (26.6 -> 34.4 Msym/s measured on a 4K-latent-sized stream; the remaining
// cost is the serial dependency through the rANS state). Built once per
// table per call, 4096+L steps, amortized over millions of symbols.
constexpr int kLutBits = 12;

void rans_decode_stream(
    void* handle, const int32_t* indexes, int64_t n,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t* out) {
  Decoder* dec = static_cast<Decoder*>(handle);
  constexpr int kShift = kPrecision - kLutBits;
  int32_t max_t = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] > max_t) max_t = indexes[i];
  }
  std::vector<std::vector<uint16_t>> luts(static_cast<size_t>(max_t) + 1);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t t = indexes[i];
    const uint32_t* cdf = cdfs + t * cdf_stride;
    const int32_t L = cdf_lengths[t];
    const int64_t max_value = L - 2;
    const uint32_t cum = dec->peek();
    std::vector<uint16_t>& lut = luts[t];
    if (lut.empty()) {
      lut.resize(size_t{1} << kLutBits);
      int32_t v = 0;
      for (uint32_t b = 0; b < (1u << kLutBits); ++b) {
        while (v + 1 < L - 1 && cdf[v + 1] <= (b << kShift)) ++v;
        lut[b] = static_cast<uint16_t>(v);
      }
    }
    int64_t value = lut[cum >> kShift];
    while (value + 1 < L - 1 && cdf[value + 1] <= cum) ++value;
    dec->advance(cdf[value], cdf[value + 1] - cdf[value]);
    if (value == max_value) {
      int32_t cnt = 0;
      uint32_t chunk = dec->get_bypass();
      cnt += static_cast<int32_t>(chunk);
      while (chunk == kBypassMax) {
        chunk = dec->get_bypass();
        cnt += static_cast<int32_t>(chunk);
      }
      const int n_chunks = cnt + 1;
      uint64_t uraw = 0;
      for (int c = n_chunks - 1; c >= 0; --c) {
        uraw |= static_cast<uint64_t>(dec->get_bypass()) << (c * kBypassBits);
      }
      const int64_t rv = static_cast<int64_t>(uraw);
      value = (rv & 1) ? -((rv + 1) >> 1) : max_value + (rv >> 1);
    }
    out[i] = static_cast<int32_t>(value + offsets[t]);
  }
}

// One-shot convenience decode.
void rans_decode_with_indexes(
    const uint8_t* data, int64_t nbytes, const int32_t* indexes, int64_t n,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t* out) {
  Decoder dec;
  dec.init(data, static_cast<size_t>(nbytes));
  rans_decode_stream(&dec, indexes, n, cdfs, cdf_stride, cdf_lengths, offsets, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// wrANS: wide (multi-lane) rANS for the DEVICE-side decoder.
//
// The reference's decode contract (raw2bit.py:1982-2025) alternates host
// range coding with device parameter passes — num_slices serial host<->device
// round trips. Through a remote-dispatch backend each round trip costs tens
// of ms of fixed latency, so the TPU-native redesign moves the range DECODER
// onto the device: K independent rANS lanes decode in lock step inside one
// XLA program (realcamnet_tpu/entropy/wrans.py), and the whole ChARM decode
// becomes ONE dispatch. This host-side encoder produces that format.
//
// Format (one frame):
//   - lane j encodes, in reverse, the symbols at positions p (p % K == j)
//     within each segment (segments are decoded in order; lane state and
//     word pointer persist across segments);
//   - 32-bit state, 16-bit probability precision, 16-bit-word renorm
//     (<= 1 word read per symbol on decode);
//   - per-lane word streams stored forward (decode reads forward), initial
//     decode state = encoder's final state, carried in a header;
//   - out-of-table symbols encode the table's escape slot in-stream and the
//     raw value in an uncompressed appendix (positions + int32 values), so
//     the lock-step device loop needs no variable-length bypass reads.
// ---------------------------------------------------------------------------

namespace {
constexpr uint32_t kWLow = 1u << 16;  // lane state renorm floor
}

extern "C" {

// Returns total words written, or -1 on insufficient capacity (words or
// appendix). Outputs: words_out (all lanes concatenated, each lane's words
// in decode order), lane_word_counts[K], lane_states[K] (initial decode
// states), esc_pos/esc_val appendix (global positions) + esc_count.
int64_t wrans_encode_lanes(
    const int32_t* symbols, const int32_t* indexes, int64_t n,
    const int64_t* seg_starts, int64_t n_segs, int64_t K,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets,
    uint16_t* words_out, int64_t words_capacity,
    uint32_t* lane_word_counts, uint32_t* lane_states,
    int32_t* esc_pos, int32_t* esc_val, int64_t esc_capacity,
    int64_t* esc_count) {
  // Escapes are appendix-coded; find them in forward order first (decode
  // applies them after each segment, order is irrelevant, but forward order
  // keeps the appendix deterministic and testable).
  int64_t n_esc = 0;
  for (int64_t p = 0; p < n; ++p) {
    const int32_t t = indexes[p];
    const int64_t max_value = cdf_lengths[t] - 2;
    const int64_t value = static_cast<int64_t>(symbols[p]) - offsets[t];
    if (value < 0 || value >= max_value) {
      if (n_esc >= esc_capacity) return -1;
      esc_pos[n_esc] = static_cast<int32_t>(p);
      esc_val[n_esc] = symbols[p];
      ++n_esc;
    }
  }
  *esc_count = n_esc;

  std::vector<int64_t> lane_positions;  // one lane's positions, reused
  std::vector<uint16_t> lane_words;     // one lane's words, back-to-front
  int64_t total_words = 0;
  for (int64_t j = 0; j < K; ++j) {
    lane_positions.clear();
    for (int64_t s = 0; s < n_segs; ++s) {
      const int64_t lo = seg_starts[s];
      const int64_t hi = (s + 1 < n_segs) ? seg_starts[s + 1] : n;
      for (int64_t p = lo + j; p < hi; p += K) lane_positions.push_back(p);
    }
    lane_words.clear();
    uint32_t st = kWLow;
    for (int64_t i = static_cast<int64_t>(lane_positions.size()) - 1; i >= 0;
         --i) {
      const int64_t p = lane_positions[i];
      const int32_t t = indexes[p];
      const uint32_t* cdf = cdfs + t * cdf_stride;
      const int64_t max_value = cdf_lengths[t] - 2;
      int64_t value = static_cast<int64_t>(symbols[p]) - offsets[t];
      if (value < 0 || value >= max_value) value = max_value;  // escape slot
      const uint32_t start = cdf[value];
      const uint32_t freq = cdf[value + 1] - start;
      // 16-bit renorm: emit until st < freq << 16 (at most one emit, since
      // one shift brings st below 2^16 <= freq << 16).
      while (static_cast<uint64_t>(st) >= (static_cast<uint64_t>(freq) << 16)) {
        lane_words.push_back(static_cast<uint16_t>(st & 0xffff));
        st >>= 16;
      }
      st = ((st / freq) << 16) + (st % freq) + start;
    }
    lane_states[j] = st;
    lane_word_counts[j] = static_cast<uint32_t>(lane_words.size());
    if (total_words + static_cast<int64_t>(lane_words.size()) > words_capacity)
      return -1;
    // Encoder emitted back-to-front; decoder reads forward.
    for (int64_t i = static_cast<int64_t>(lane_words.size()) - 1; i >= 0; --i)
      words_out[total_words++] = lane_words[i];
  }
  return total_words;
}

}  // extern "C"
