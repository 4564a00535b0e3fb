// Native window sampler: the host-side hot path of the training data
// pipeline.
//
// The reference implementation assembles training windows inside PyTorch
// DataLoader worker *processes* (python/numpy per item;
// /root/reference/humor/datasets/amass_discrete_dataset.py:291-665 +
// train_humor.py:130-141 workers=2). For a TPU host feeding an accelerator,
// that design burns CPU on pickling and per-item python. This library
// replaces it with an in-process, multithreaded gather over a flat
// sequence store:
//
//   store   : one contiguous float32 [total_frames, frame_dim] matrix of
//             all preprocessed sequences, concatenated
//   offsets : per-sequence start row
//   lengths : per-sequence frame counts
//
// sample_windows() draws (sequence, start) pairs with a counter-based
// xorshift RNG (deterministic given seed), gather_windows() copies
// [B, W, frame_dim] batches with a thread pool, optionally adding
// gaussian noise. Per-step canonicalization happens afterwards ON DEVICE
// (humor_tpu.data.windows.window_to_pairs) for the whole batch at once —
// the split of labor the reference cannot express.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// splitmix64: deterministic counter-based RNG (good enough for sampling)
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97f4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

static inline double uniform01(uint64_t bits) {
  return static_cast<double>(bits >> 11) * (1.0 / 9007199254740992.0);
}

// Box-Muller from two counter draws
static inline float gauss(uint64_t seed, uint64_t ctr) {
  double u1 = uniform01(splitmix64(seed ^ (2 * ctr)));
  double u2 = uniform01(splitmix64(seed ^ (2 * ctr + 1)));
  u1 = std::max(u1, 1e-12);
  return static_cast<float>(std::sqrt(-2.0 * std::log(u1)) *
                            std::cos(2.0 * M_PI * u2));
}

void parallel_for(int64_t n, int num_threads,
                  const std::function<void(int64_t, int64_t)> &fn) {
  if (num_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  num_threads = std::min<int64_t>(num_threads, n);
  std::vector<std::thread> threads;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t s = t * chunk;
    int64_t e = std::min<int64_t>(n, s + chunk);
    if (s >= e) break;
    threads.emplace_back([=, &fn] { fn(s, e); });
  }
  for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// Draw `batch` window starts: windows of `window_len` frames, uniform over
// sequences weighted by available positions. Writes (seq_idx, start) pairs.
// Returns 0 on success, -1 if no sequence is long enough.
int sample_windows(const int64_t *lengths, int64_t num_seqs,
                   int64_t window_len, uint64_t seed, int64_t batch,
                   int64_t *out_seq_idx, int64_t *out_start) {
  // cumulative count of valid start positions
  std::vector<int64_t> cum(num_seqs + 1, 0);
  for (int64_t i = 0; i < num_seqs; ++i) {
    int64_t avail = lengths[i] - window_len + 1;
    cum[i + 1] = cum[i] + std::max<int64_t>(avail, 0);
  }
  int64_t total = cum[num_seqs];
  if (total <= 0) return -1;
  for (int64_t b = 0; b < batch; ++b) {
    uint64_t bits = splitmix64(seed ^ static_cast<uint64_t>(b) * 0x9E37ULL);
    int64_t pos = static_cast<int64_t>(uniform01(bits) * total);
    pos = std::min(pos, total - 1);
    // binary search for the owning sequence
    int64_t lo = 0, hi = num_seqs;
    while (lo + 1 < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cum[mid] <= pos) lo = mid; else hi = mid;
    }
    out_seq_idx[b] = lo;
    out_start[b] = pos - cum[lo];
  }
  return 0;
}

// Gather [batch, window_len, frame_dim] float32 windows from the store.
// noise_std > 0 adds deterministic gaussian noise (seeded per element).
void gather_windows(const float *store, const int64_t *offsets,
                    int64_t frame_dim, const int64_t *seq_idx,
                    const int64_t *start, int64_t batch,
                    int64_t window_len, float noise_std, uint64_t seed,
                    int num_threads, float *out) {
  const int64_t win_elems = window_len * frame_dim;
  parallel_for(batch, num_threads, [&](int64_t s, int64_t e) {
    for (int64_t b = s; b < e; ++b) {
      const float *src =
          store + (offsets[seq_idx[b]] + start[b]) * frame_dim;
      float *dst = out + b * win_elems;
      std::memcpy(dst, src, sizeof(float) * win_elems);
      if (noise_std > 0.0f) {
        uint64_t base = splitmix64(seed ^ static_cast<uint64_t>(b));
        for (int64_t i = 0; i < win_elems; ++i) {
          dst[i] += noise_std * gauss(base, static_cast<uint64_t>(i));
        }
      }
    }
  });
}

// Gather rows (e.g. per-sequence betas/meta) by index.
void gather_rows(const float *table, int64_t row_dim, const int64_t *idx,
                 int64_t n, float *out) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * row_dim, table + idx[i] * row_dim,
                sizeof(float) * row_dim);
  }
}

}  // extern "C"
