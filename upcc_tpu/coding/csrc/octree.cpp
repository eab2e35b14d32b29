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

#include <algorithm>
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

// context: [level bucket(4)][6-neighbor occupancy count(7)]
//          [child slot(8)][bits-so-far sibling pattern(128)]
// The 6-neighbor count of the *node being expanded* is known to encoder and
// decoder alike (the whole node set of a level is decoded before any of its
// occupancy bytes), the same structural idea as G-PCC's neighbour contexts.
constexpr int kMaxLevels = 21;
constexpr int kCtxCount = 4 * 7 * 8 * 128;
inline int level_bucket(int level, int levels) {
  int from_leaf = levels - level;  // 1 = last level before leaves
  if (from_leaf <= 1) return 0;
  if (from_leaf == 2) return 1;
  if (from_leaf == 3) return 2;
  return 3;
}
inline int ctx_index(int lb, int nbr6, int slot, int pattern) {
  return (((lb * 7) + nbr6) * 8 + slot) * 128 + pattern;
}

// decode morton code -> 3 coords (21 bits each)
inline void morton_to_xyz(int64_t m, int64_t* x) {
  for (int a = 0; a < 3; ++a) {
    int64_t v = 0;
    for (int b = 0; b < 21; ++b) v |= ((m >> (3 * b + 2 - a)) & 1) << b;
    x[a] = v;
  }
}

inline int64_t xyz_to_morton(const int64_t* x) {
  int64_t m = 0;
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 21; ++b) m |= ((x[a] >> b) & 1) << (3 * b + 2 - a);
  return m;
}

// count occupied face-neighbors of `code` within the sorted level set
inline int count_nbr6(const std::vector<int64_t>& nodes, int64_t code,
                      int level_bits) {
  int64_t x[3];
  morton_to_xyz(code, x);
  int cnt = 0;
  const int64_t lim = int64_t(1) << level_bits;
  for (int a = 0; a < 3; ++a) {
    for (int d = -1; d <= 1; d += 2) {
      int64_t q[3] = {x[0], x[1], x[2]};
      q[a] += d;
      if (q[a] < 0 || q[a] >= lim) continue;
      int64_t mc = xyz_to_morton(q);
      auto it = std::lower_bound(nodes.begin(), nodes.end(), mc);
      if (it != nodes.end() && *it == mc) ++cnt;
    }
  }
  return cnt > 6 ? 6 : cnt;
}

}  // namespace

extern "C" {

// codes: sorted unique morton codes (< 8^levels), n >= 1.
// Returns bytes written or -1 on overflow.
int64_t octree_encode(const int64_t* codes, int64_t n, int levels,
                      uint8_t* out, int64_t out_cap) {
  if (levels > kMaxLevels) return -3;
  std::vector<uint16_t> probs(kCtxCount, 1u << (kProbBits - 1));
  Encoder enc;
  enc.out.reserve((size_t)(n / 2 + 64));

  // nodes at the current level, as (start, end) ranges into `codes`,
  // plus the node prefix codes themselves for neighbor contexts
  std::vector<int64_t> starts{0}, ends{n}, nodes{0};
  for (int level = 0; level < levels; ++level) {
    const int shift = 3 * (levels - level - 1);
    const int lb = level_bucket(level, levels);
    std::vector<int64_t> nstarts, nends, nnodes;
    nstarts.reserve(starts.size() * 4);
    nends.reserve(starts.size() * 4);
    nnodes.reserve(starts.size() * 4);
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
      const int nb6 = count_nbr6(nodes, nodes[k], level);
      int pattern = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = cs[c + 1] > cs[c] ? 1 : 0;
        uint16_t& pr = probs[ctx_index(lb, nb6, c, pattern)];
        enc.encode(bit, pr);
        pattern = ((pattern << 1) | bit) & 127;
        if (bit && level + 1 < levels) {
          nstarts.push_back(cs[c]);
          nends.push_back(cs[c + 1]);
          nnodes.push_back((nodes[k] << 3) | c);
        }
      }
    }
    starts.swap(nstarts);
    ends.swap(nends);
    nodes.swap(nnodes);
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
  std::vector<uint16_t> probs(kCtxCount, 1u << (kProbBits - 1));
  Decoder dec{data, nbytes};
  dec.init();

  std::vector<int64_t> nodes{0};  // morton prefixes at current level
  for (int level = 0; level < levels; ++level) {
    const int lb = level_bucket(level, levels);
    std::vector<int64_t> next;
    next.reserve(nodes.size() * 4);
    for (int64_t node : nodes) {
      const int nb6 = count_nbr6(nodes, node, level);
      int pattern = 0;
      for (int c = 0; c < 8; ++c) {
        uint16_t& pr = probs[ctx_index(lb, nb6, c, pattern)];
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
