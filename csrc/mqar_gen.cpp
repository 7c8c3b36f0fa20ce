// Fast MQAR synthesis — native data generator for the tlie_tpu framework.
//
// Generates the multi-query associative-recall task (zoology-style; task
// semantics as in tlie_tpu/data/mqar.py and ref dataloaders/mqar.py:16-136)
// directly into caller-provided int64 buffers:
//   * unique keys / values per example via partial Fisher–Yates,
//   * power-law query gaps without replacement via Gumbel-top-k,
//   * optional random replacement of zero fillers.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// Parallelised across examples with a deterministic splitmix/xoshiro RNG
// per row, so results are reproducible for a given seed regardless of
// thread count.
//
// Build: see tlie_tpu/native/__init__.py (cc -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Xoshiro256 {
  uint64_t s[4];

  explicit Xoshiro256(uint64_t seed) {
    // splitmix64 seeding
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

  inline double uniform() {  // in (0, 1)
    return ((next() >> 11) + 0.5) * (1.0 / 9007199254740992.0);
  }

  inline int64_t below(int64_t n) { return (int64_t)(next() % (uint64_t)n); }
};

// Sample k distinct values from [lo, hi) by partial Fisher–Yates on a
// scratch index vector.
inline void sample_distinct(Xoshiro256& rng, int64_t lo, int64_t hi, int64_t k,
                            std::vector<int64_t>& scratch, int64_t* out) {
  const int64_t n = hi - lo;
  scratch.resize(n);
  for (int64_t i = 0; i < n; ++i) scratch[i] = lo + i;
  for (int64_t i = 0; i < k; ++i) {
    int64_t j = i + rng.below(n - i);
    std::swap(scratch[i], scratch[j]);
    out[i] = scratch[i];
  }
}

}  // namespace

extern "C" {

// inputs, labels: preallocated (n, L) int64 row-major buffers.
void mqar_generate(int64_t* inputs, int64_t* labels, int64_t n, int64_t L,
                   int64_t vocab, int64_t kv, double power_a, uint64_t seed,
                   int random_non_queries) {
  const int64_t context = 2 * kv;
  const int64_t key_vocab = vocab / 2;
  const int64_t space = (L - context) / 2;

  // log-probabilities of the power-law gap distribution (shared)
  std::vector<double> logp(space);
  for (int64_t i = 0; i < space; ++i) {
    logp[i] = std::log(power_a) + (power_a - 1.0) * std::log((double)(i + 1));
  }

#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t e = 0; e < n; ++e) {
    Xoshiro256 rng(seed * 0x9e3779b97f4a7c15ULL + (uint64_t)e);
    std::vector<int64_t> scratch;
    std::vector<int64_t> keys(kv), values(kv), gaps(kv);

    sample_distinct(rng, 1, key_vocab, kv, scratch, keys.data());
    sample_distinct(rng, key_vocab, vocab, kv, scratch, values.data());

    // Gumbel-top-k for weighted sampling of gaps without replacement
    std::vector<std::pair<double, int64_t>> scored(space);
    for (int64_t i = 0; i < space; ++i) {
      double g = -std::log(-std::log(rng.uniform()));
      scored[i] = {-(logp[i] + g), i};
    }
    std::partial_sort(scored.begin(), scored.begin() + kv, scored.end());
    for (int64_t i = 0; i < kv; ++i) gaps[i] = scored[i].second;

    int64_t* in_row = inputs + e * L;
    int64_t* lb_row = labels + e * L;
    std::memset(in_row, 0, sizeof(int64_t) * (size_t)L);
    for (int64_t t = 0; t < L; ++t) lb_row[t] = -100;

    for (int64_t i = 0; i < kv; ++i) {
      in_row[2 * i] = keys[i];
      in_row[2 * i + 1] = values[i];
    }
    // examples = concat(kvs, queries)[:-1]; labels shifted: the full
    // (L+1)-length layout puts key at context+2g and value-label at
    // context+2g+1; after the off-by-one slicing both land at index
    // context + 2g of the emitted rows (see the numpy reference).
    for (int64_t i = 0; i < kv; ++i) {
      int64_t pos = context + 2 * gaps[i];
      if (pos < L) {
        in_row[pos] = keys[i];
        lb_row[pos] = values[i];
      }
    }
    if (random_non_queries) {
      for (int64_t t = 0; t < L; ++t) {
        if (in_row[t] == 0) in_row[t] = rng.below(vocab);
      }
    }
  }
}

}  // extern "C"
