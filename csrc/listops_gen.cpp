// Fast ListOps synthesis — native data generator for the tlie_tpu framework.
//
// Implements the same growth-scheme generator as
// tlie_tpu/data/listops.py::generate_listops_by_growth (the LRA rejection
// recipe accepts ~0 samples/s in the [500, 2000] length window offline, see
// that docstring): grow a MIN/MAX/MED/SM tree to ~target tokens by expanding
// random digit leaves, evaluate it bottom-up, and emit CANONICAL token ids
//   0..9   digit values
//   10..13 "[MIN" "[MAX" "[MED" "[SM"
//   14     "X" (the tokenizer's rendering of "]")
// directly into caller buffers — no Python tree objects, no string
// round-trip (the Python generator measured 118 examples/s on this host;
// the full 96k+2k reference split is ~14 min there, <2 s here).
//
// Same C-ABI/ctypes/threading conventions as mqar_gen.cpp: per-example
// deterministic RNG (seed, index) so results are reproducible for a given
// seed regardless of thread count.

#include <algorithm>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Xoshiro256 {
  uint64_t s[4];

  explicit Xoshiro256(uint64_t seed) {
    uint64_t z = seed;
    for (int i = 0; i < 4; ++i) {
      z += 0x9e3779b97f4a7c15ULL;
      uint64_t t = z;
      t = (t ^ (t >> 30)) * 0xbf58476d1ce4e5b9ULL;
      t = (t ^ (t >> 27)) * 0x94d049bb133111ebULL;
      s[i] = t ^ (t >> 31);
    }
  }

  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }

  inline uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  inline int64_t below(int64_t n) { return (int64_t)(next() % (uint64_t)n); }
};

constexpr int kOps = 4;  // MIN MAX MED SM — ids 10..13
constexpr int32_t kClose = 14;

struct Node {
  int8_t op;                  // -1: digit leaf (value in val), else op 0..3
  int8_t val;                 // leaf digit
  std::vector<int32_t> kids;  // arena indices
};

// One grown tree; returns total token count (== tokenized length).
int64_t grow(Xoshiro256& rng, int64_t target, int64_t max_depth,
             int64_t max_args, std::vector<Node>& arena) {
  arena.clear();
  // (node, child-slot, depth) candidates for expansion
  struct Leaf {
    int32_t node;
    int32_t slot;
    int32_t depth;
  };
  std::vector<Leaf> leaves;

  auto make_op_node = [&](int64_t k) {
    Node n;
    n.op = (int8_t)rng.below(kOps);
    n.val = 0;
    n.kids.reserve(k);
    for (int64_t i = 0; i < k; ++i) {
      Node leaf;
      leaf.op = -1;
      leaf.val = (int8_t)rng.below(10);
      arena.push_back(leaf);
      n.kids.push_back((int32_t)(arena.size() - 1));
    }
    arena.push_back(std::move(n));
    return (int32_t)(arena.size() - 1);
  };

  const int64_t n0 = 2 + rng.below(max_args - 1);  // [2, max_args]
  int32_t root = make_op_node(n0);
  int64_t tokens = 2 + n0;
  for (int32_t i = 0; i < (int32_t)n0; ++i)
    leaves.push_back({root, i, 1});

  while (tokens < target && !leaves.empty()) {
    const int64_t li = rng.below((int64_t)leaves.size());
    const Leaf lf = leaves[li];
    leaves[li] = leaves.back();
    leaves.pop_back();
    if (lf.depth >= max_depth) continue;
    const int64_t k = 2 + rng.below(max_args - 1);
    const int32_t node = make_op_node(k);
    arena[lf.node].kids[lf.slot] = node;
    tokens += 1 + k;
    for (int32_t i = 0; i < (int32_t)k; ++i)
      leaves.push_back({node, i, lf.depth + 1});
  }
  return tokens;
}

// Evaluate + emit canonical ids, iteratively (depth ≤ 10 so recursion is
// also fine, but keep it stack-safe).
int eval_node(const std::vector<Node>& arena, int32_t idx) {
  const Node& n = arena[idx];
  if (n.op < 0) return n.val;
  std::vector<int> vals;
  vals.reserve(n.kids.size());
  for (int32_t c : n.kids) vals.push_back(eval_node(arena, c));
  switch (n.op) {
    case 0:
      return *std::min_element(vals.begin(), vals.end());
    case 1:
      return *std::max_element(vals.begin(), vals.end());
    case 2: {  // MED — int(np.median): mean of middle two for even n, trunc
      std::sort(vals.begin(), vals.end());
      const size_t m = vals.size() / 2;
      if (vals.size() % 2) return vals[m];
      return (int)((vals[m - 1] + vals[m]) / 2.0);
    }
    default: {  // SM
      int s = 0;
      for (int v : vals) s += v;
      return s % 10;
    }
  }
}

void emit(const std::vector<Node>& arena, int32_t idx, int32_t* out,
          int64_t& pos) {
  const Node& n = arena[idx];
  if (n.op < 0) {
    out[pos++] = n.val;
    return;
  }
  out[pos++] = 10 + n.op;
  for (int32_t c : n.kids) emit(arena, c, out, pos);
  out[pos++] = kClose;
}

}  // namespace

extern "C" {

// out_tokens: (n, l_max) int32, padded with -1.  out_lengths: (n,) int32.
// out_targets: (n,) int64.
void listops_generate(int32_t* out_tokens, int32_t* out_lengths,
                      int64_t* out_targets, int64_t n, int64_t l_max,
                      int64_t min_len, int64_t max_len, int64_t max_depth,
                      int64_t max_args, uint64_t seed, int threads) {
#if defined(_OPENMP)
  if (threads > 0) omp_set_num_threads(threads);
#pragma omp parallel for schedule(dynamic, 16)
#endif
  for (int64_t i = 0; i < n; ++i) {
    Xoshiro256 rng(seed * 0x9e3779b97f4a7c15ULL + (uint64_t)i * 2654435761ULL);
    std::vector<Node> arena;
    int64_t tokens = 0;
    for (;;) {
      const int64_t target = min_len + rng.below(max_len - min_len + 1);
      tokens = grow(rng, target, max_depth, max_args, arena);
      if (tokens >= min_len && tokens <= max_len && tokens <= l_max) break;
    }
    // root = node created after its n0 initial digit children, and every
    // later node also lands after its children — the root is the LAST op
    // node created at depth 0, i.e. the first op node: find it as the
    // unique node not referenced by any kids list.
    std::vector<char> referenced(arena.size(), 0);
    for (const Node& nd : arena)
      for (int32_t c : nd.kids) referenced[c] = 1;
    int32_t root = -1;
    for (int32_t j = 0; j < (int32_t)arena.size(); ++j)
      if (!referenced[j] && arena[j].op >= 0) root = j;
    int32_t* row = out_tokens + i * l_max;
    for (int64_t t = 0; t < l_max; ++t) row[t] = -1;
    int64_t pos = 0;
    emit(arena, root, row, pos);
    out_lengths[i] = (int32_t)pos;
    out_targets[i] = eval_node(arena, root);
  }
}

}  // extern "C"
