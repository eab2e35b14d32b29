// Lossless octree coordinate codec over sorted Morton codes.
//
// Native replacement for the reference's G-PCC (tmc3) subprocess that
// losslessly codes latent coordinates (/root/reference/model/model.py:388-486,
// SURVEY.md §2 native component 3).  Instead of shelling out with temp PLY
// files, this codes the breadth-first octree occupancy of the block's
// Morton keys directly: each occupied node emits 8 child-occupancy bits
// through an adaptive binary range coder with (level, child-slot,
// decoded-sibling-pattern) contexts.
//
// Build: g++ -O3 -shared -fPIC octree.cpp -o liboctree.so

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

// ---- adaptive binary range coder (32-bit, carry-less) ----

constexpr uint32_t kTop = 1u << 24;
constexpr int kProbBits = 16;
constexpr int kAdapt = 5;  // probability adaptation shift

struct Encoder {
  std::vector<uint8_t> out;
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;

  inline void encode(int bit, uint16_t& prob) {
    // prob = P(bit == 0) in [1, 2^16-1]
    uint32_t split = (uint32_t)(((uint64_t)range * prob) >> kProbBits);
    if (bit == 0) {
      range = split;
      prob += (uint16_t)(((1u << kProbBits) - prob) >> kAdapt);
    } else {
      uint32_t nlow = low + split;
      if (nlow < low) carry();  // propagate carry into emitted bytes
      low = nlow;
      range -= split;
      prob -= (uint16_t)(prob >> kAdapt);
    }
    while (range < kTop) {
      out.push_back((uint8_t)(low >> 24));
      low <<= 8;
      range <<= 8;
    }
  }

  inline void carry() {
    // increment the last emitted non-0xFF byte chain
    for (int64_t i = (int64_t)out.size() - 1; i >= 0; --i) {
      if (out[i] != 0xFF) { out[i]++; return; }
      out[i] = 0;
    }
  }

  void flush() {
    for (int i = 0; i < 4; ++i) {
      out.push_back((uint8_t)(low >> 24));
      low <<= 8;
    }
  }
};

struct Decoder {
  const uint8_t* in;
  int64_t size;
  int64_t pos = 0;
  uint32_t code = 0;
  uint32_t range = 0xFFFFFFFFu;

  void init() {
    for (int i = 0; i < 4; ++i) code = (code << 8) | next();
  }
  inline uint8_t next() { return pos < size ? in[pos++] : 0; }

  inline int decode(uint16_t& prob) {
    uint32_t split = (uint32_t)(((uint64_t)range * prob) >> kProbBits);
    int bit;
    if (code < split) {
      bit = 0;
      range = split;
      prob += (uint16_t)(((1u << kProbBits) - prob) >> kAdapt);
    } else {
      bit = 1;
      code -= split;
      range -= split;
      prob -= (uint16_t)(prob >> kAdapt);
    }
    while (range < kTop) {
      code = (code << 8) | next();
      range <<= 8;
    }
    return bit;
  }
};

// context: [level(<=21)][child slot(8)][bits-so-far pattern(128)]
constexpr int kMaxLevels = 21;
inline int ctx_index(int level, int slot, int pattern) {
  return ((level * 8) + slot) * 128 + pattern;
}

}  // namespace

extern "C" {

// codes: sorted unique morton codes (< 8^levels), n >= 1.
// Returns bytes written or -1 on overflow.
int64_t octree_encode(const int64_t* codes, int64_t n, int levels,
                      uint8_t* out, int64_t out_cap) {
  if (levels > kMaxLevels) return -3;
  std::vector<uint16_t> probs((size_t)kMaxLevels * 8 * 128, 1u << (kProbBits - 1));
  Encoder enc;
  enc.out.reserve((size_t)(n / 2 + 64));

  // nodes at the current level, as (start, end) ranges into `codes`
  std::vector<int64_t> starts{0}, ends{n};
  for (int level = 0; level < levels; ++level) {
    const int shift = 3 * (levels - level - 1);
    std::vector<int64_t> nstarts, nends;
    nstarts.reserve(starts.size() * 4);
    nends.reserve(starts.size() * 4);
    for (size_t k = 0; k < starts.size(); ++k) {
      int64_t s = starts[k], e = ends[k];
      // child boundaries: cs[c]..cs[c+1] is child c's range
      int64_t cs[9];
      int64_t p = s;
      for (int c = 0; c < 8; ++c) {
        cs[c] = p;
        while (p < e && (int)((codes[p] >> shift) & 7) == c) ++p;
      }
      cs[8] = e;
      int pattern = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = cs[c + 1] > cs[c] ? 1 : 0;
        uint16_t& pr = probs[ctx_index(level, c, pattern)];
        enc.encode(bit, pr);
        pattern = ((pattern << 1) | bit) & 127;
        if (bit && level + 1 < levels) {
          nstarts.push_back(cs[c]);
          nends.push_back(cs[c + 1]);
        }
      }
    }
    starts.swap(nstarts);
    ends.swap(nends);
  }
  enc.flush();
  if ((int64_t)enc.out.size() > out_cap) return -1;
  for (size_t i = 0; i < enc.out.size(); ++i) out[i] = enc.out[i];
  return (int64_t)enc.out.size();
}

// Decodes into `out` (sorted morton codes). Returns count or -1 on overflow.
int64_t octree_decode(const uint8_t* data, int64_t nbytes, int levels,
                      int64_t* out, int64_t out_cap) {
  if (levels > kMaxLevels) return -3;
  std::vector<uint16_t> probs((size_t)kMaxLevels * 8 * 128, 1u << (kProbBits - 1));
  Decoder dec{data, nbytes};
  dec.init();

  std::vector<int64_t> nodes{0};  // morton prefixes at current level
  for (int level = 0; level < levels; ++level) {
    std::vector<int64_t> next;
    next.reserve(nodes.size() * 4);
    for (int64_t node : nodes) {
      int pattern = 0;
      for (int c = 0; c < 8; ++c) {
        uint16_t& pr = probs[ctx_index(level, c, pattern)];
        int bit = dec.decode(pr);
        pattern = ((pattern << 1) | bit) & 127;
        if (bit) next.push_back((node << 3) | c);
      }
    }
    nodes.swap(next);
    if ((int64_t)nodes.size() > out_cap) return -1;
  }
  for (size_t i = 0; i < nodes.size(); ++i) out[i] = nodes[i];
  return (int64_t)nodes.size();
}

}  // extern "C"
