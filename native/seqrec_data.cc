// seqrec_tpu native host-side data engine.
//
// The TPU-side step is one XLA program; the host's only job is to keep the
// feed queue full. This C++ engine owns that job: shuffled epoch iteration
// over ragged user sequences, truncation to the most recent window, bucketed
// fixed-shape padding (inputs/targets/mask), and a background prefetch thread
// filling a bounded ring of ready batches. Exposed as a C ABI consumed via
// ctypes (seqrec_tpu/data/native.py); semantics mirror the Python
// BucketBatcher (data/batching.py) exactly — the Python side is the oracle
// in tests/unit/test_native_loader.py.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no deps)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  int bucket;              // padded length T of this batch
  std::vector<int32_t> inputs;   // [B, T]
  std::vector<int32_t> targets;  // [B, T]
  std::vector<float> mask;       // [B, T]
  std::vector<int32_t> users;    // [B] user id + 1 (0 = unknown)
};

struct Loader {
  // Dataset (borrowed copies — the engine owns its memory so the Python
  // arrays can be garbage collected).
  std::vector<int32_t> items;
  std::vector<int64_t> offsets;
  // Config.
  int batch_size;
  int max_len;
  std::vector<int> buckets;  // ascending, last == max_len
  uint64_t seed;
  int shard_index, shard_count;
  int hold_out;  // items to drop from each tail (2 = leave-last-out train)
  int64_t skip;  // batches to fast-forward past without materializing
  // Prefetch machinery.
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<Batch> ready;
  size_t capacity;
  std::atomic<bool> stop{false};

  int num_users() const { return static_cast<int>(offsets.size()) - 1; }

  int pick_bucket(int steps) const {
    for (int b : buckets)
      if (steps <= b) return b;
    return buckets.back();
  }

  void run() {
    std::mt19937_64 rng(seed);
    std::vector<int> users;
    for (int u = shard_index; u < num_users(); ++u)
      if (u % shard_count == shard_index % shard_count) users.push_back(u);
    if (users.empty()) return;
    // Pending rows per bucket: store (user, len) and emit when full.
    std::vector<std::vector<int>> pending(buckets.size());
    while (!stop.load(std::memory_order_relaxed)) {
      std::shuffle(users.begin(), users.end(), rng);
      for (int u : users) {
        if (stop.load(std::memory_order_relaxed)) return;
        int64_t beg = offsets[u], end = offsets[u + 1] - hold_out;
        int64_t len = end - beg;
        if (len < 2) continue;  // need >= 1 transition
        if (len > max_len + 1) {
          beg = end - (max_len + 1);
          len = max_len + 1;
        }
        int steps = static_cast<int>(len) - 1;
        int bi = 0;
        while (buckets[bi] < steps) ++bi;
        pending[bi].push_back(u);
        if (static_cast<int>(pending[bi].size()) == batch_size) {
          // Checkpoint-resume fast-forward: replay the stream's bookkeeping
          // (shuffle order + bucket fills) without building or queueing the
          // batch — O(consumed users) integer work, so a million-batch
          // position costs well under a second.
          if (skip > 0) {
            --skip;
          } else {
            emit(pending[bi], buckets[bi]);
          }
          pending[bi].clear();
        }
      }
    }
  }

  void emit(const std::vector<int>& rows, int T) {
    Batch b;
    b.bucket = T;
    b.inputs.assign(static_cast<size_t>(batch_size) * T, 0);
    b.targets.assign(static_cast<size_t>(batch_size) * T, 0);
    b.mask.assign(static_cast<size_t>(batch_size) * T, 0.0f);
    b.users.assign(static_cast<size_t>(batch_size), 0);
    for (size_t r = 0; r < rows.size(); ++r) {
      int u = rows[r];
      b.users[r] = u + 1;  // model-boundary ids: 0 = unknown user
      int64_t beg = offsets[u], end = offsets[u + 1] - hold_out;
      int64_t len = end - beg;
      if (len > max_len + 1) {
        beg = end - (max_len + 1);
        len = max_len + 1;
      }
      int steps = static_cast<int>(len) - 1;
      for (int t = 0; t < steps; ++t) {
        b.inputs[r * T + t] = items[beg + t];
        b.targets[r * T + t] = items[beg + t + 1];
        b.mask[r * T + t] = 1.0f;
      }
    }
    std::unique_lock<std::mutex> lk(mu);
    cv_put.wait(lk, [&] { return ready.size() < capacity || stop.load(); });
    if (stop.load()) return;
    ready.push(std::move(b));
    cv_get.notify_one();
  }
};

}  // namespace

extern "C" {

void* srd_create(const int32_t* items, int64_t num_items,
                 const int64_t* offsets, int64_t num_offsets,
                 int batch_size, int max_len, const int* buckets,
                 int num_buckets, uint64_t seed, int shard_index,
                 int shard_count, int hold_out, int prefetch,
                 int64_t skip_batches) {
  auto* L = new Loader();
  L->items.assign(items, items + num_items);
  L->offsets.assign(offsets, offsets + num_offsets);
  L->batch_size = batch_size;
  L->max_len = max_len;
  for (int i = 0; i < num_buckets; ++i) L->buckets.push_back(buckets[i]);
  std::sort(L->buckets.begin(), L->buckets.end());
  if (L->buckets.empty() || L->buckets.back() < max_len)
    L->buckets.push_back(max_len);
  L->seed = seed;
  L->shard_index = shard_index;
  L->shard_count = shard_count < 1 ? 1 : shard_count;
  L->hold_out = hold_out;
  L->skip = skip_batches < 0 ? 0 : skip_batches;
  L->capacity = prefetch < 1 ? 1 : static_cast<size_t>(prefetch);
  L->worker = std::thread([L] { L->run(); });
  return L;
}

// Blocks until a batch is ready; writes into caller buffers sized
// [batch_size * max_len] (only the first batch_size*T entries are written)
// plus a [batch_size] users buffer. Returns the bucket length T, or -1 if
// the loader is stopped/empty.
int srd_next_batch(void* handle, int32_t* inputs, int32_t* targets,
                   float* mask, int32_t* users) {
  auto* L = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_get.wait(lk, [&] { return !L->ready.empty() || L->stop.load(); });
    if (L->ready.empty()) return -1;
    b = std::move(L->ready.front());
    L->ready.pop();
    L->cv_put.notify_one();
  }
  size_t n = b.inputs.size();
  std::memcpy(inputs, b.inputs.data(), n * sizeof(int32_t));
  std::memcpy(targets, b.targets.data(), n * sizeof(int32_t));
  std::memcpy(mask, b.mask.data(), n * sizeof(float));
  std::memcpy(users, b.users.data(), b.users.size() * sizeof(int32_t));
  return b.bucket;
}

void srd_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_put.notify_all();
  L->cv_get.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

}  // extern "C"
