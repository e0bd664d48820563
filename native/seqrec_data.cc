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

// ---------------------------------------------------------------------------
// Session-parallel packed stream engine (the original GRU4Rec regime done
// TPU-style; semantics mirror data/batching.SessionStream exactly, except the
// shuffle engine is std::mt19937_64 rather than numpy PCG64 — both are
// deterministic-given-seed alternate loaders, like the bucketed pair above).
//
// Why it exists: the Python SessionStream splices ~B * window/mean_pairs
// session segments per window in an interpreted loop — measured 8.6 ms per
// [128, 50] window against a 1.3 ms compiled step (benchmarks/session_e2e.py
// 2026-08-20), making the feeder the end-to-end bottleneck of the one mode
// whose point is throughput. This engine fills windows in C++ AND packs the
// compact wire format ([B, T+E+W]: inputs, boundary targets, reset bitmask —
// see trainer.pack_session_batch) so the Python side ships bytes untouched.
//
// Checkpoint/resume: every emitted batch carries a snapshot of the stream
// state taken BEFORE filling it ([epoch, pos, (user, pair_idx, fresh) x B]);
// the Python wrapper keeps a ring of them and re-creates the loader from one
// to resume (re-shuffling epoch+1 times from the seed reproduces the rng
// exactly, as in SessionStream.restore).

struct SessionBatch {
  int kind = 1;                         // 1 = wire, 0 = planes (over budget)
  std::vector<int32_t> wire;            // [B, T+E+W] when kind == 1
  std::vector<int32_t> inputs, targets; // [B, T] (always filled)
  std::vector<float> reset;             // [B, T]
  std::vector<int64_t> snap;            // [2 + 3B]
};

struct SessionLoader {
  std::vector<int32_t> items;
  std::vector<int64_t> offsets;
  int batch_size, window, ends_budget, words;
  uint64_t seed;
  int shard_index, shard_count, hold_out;

  std::mt19937_64 rng;
  std::vector<int> users, perm;
  int64_t epoch = 0;
  size_t pos = 0;
  struct Lane {
    int user = -1;
    int64_t idx = 0;
    bool fresh = false;
    bool live = false;
  };
  std::vector<Lane> lanes;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<SessionBatch> ready;
  size_t capacity;
  std::atomic<bool> stop{false};

  int num_users() const { return static_cast<int>(offsets.size()) - 1; }

  int64_t train_len(int u) const {  // dataset.train_seq length
    int64_t len = offsets[u + 1] - offsets[u] - hold_out;
    return len < 0 ? 0 : len;
  }

  void reshuffle() {
    perm = users;
    std::shuffle(perm.begin(), perm.end(), rng);
  }

  int next_session() {
    while (true) {
      if (pos >= perm.size()) {
        ++epoch;
        reshuffle();
        pos = 0;
      }
      int u = perm[pos++];
      if (train_len(u) >= 2) return u;  // >= 1 transition
    }
  }

  void fill(SessionBatch* b) {
    const int T = window, B = batch_size;
    b->snap.resize(2 + 3 * B);
    b->snap[0] = epoch;
    b->snap[1] = static_cast<int64_t>(pos);
    for (int r = 0; r < B; ++r) {
      b->snap[2 + 3 * r] = lanes[r].live ? lanes[r].user : -1;
      b->snap[3 + 3 * r] = lanes[r].idx;
      b->snap[4 + 3 * r] = lanes[r].fresh ? 1 : 0;
    }
    b->inputs.assign(static_cast<size_t>(B) * T, 0);
    b->targets.assign(static_cast<size_t>(B) * T, 0);
    b->reset.assign(static_cast<size_t>(B) * T, 0.0f);
    for (int r = 0; r < B; ++r) {
      int p = 0;
      while (p < T) {
        if (!lanes[r].live) {
          int u = next_session();
          lanes[r] = Lane{u, 0, true, true};
        }
        Lane& l = lanes[r];
        const int64_t beg = offsets[l.user];
        const int64_t pairs = train_len(l.user) - 1;
        const int64_t take = std::min<int64_t>(pairs - l.idx, T - p);
        for (int64_t t = 0; t < take; ++t) {
          b->inputs[static_cast<size_t>(r) * T + p + t] =
              items[beg + l.idx + t];
          b->targets[static_cast<size_t>(r) * T + p + t] =
              items[beg + l.idx + t + 1];
        }
        if (l.fresh) b->reset[static_cast<size_t>(r) * T + p] = 1.0f;
        p += static_cast<int>(take);
        l.idx += take;
        l.fresh = false;
        if (l.idx >= pairs) l.live = false;
      }
    }
    pack(b);
  }

  // Mirror of trainer.pack_session_batch: decline (kind=0, planes ship) when
  // any lane has more session ends than the boundary budget E.
  void pack(SessionBatch* b) {
    const int T = window, E = ends_budget, W = words, B = batch_size;
    const size_t row = static_cast<size_t>(T + E + W);
    std::vector<int32_t> wire(static_cast<size_t>(B) * row, 0);
    for (int r = 0; r < B; ++r) {
      int ends = 0;
      for (int t = 0; t < T; ++t) {
        wire[r * row + t] = b->inputs[static_cast<size_t>(r) * T + t];
        if (b->reset[static_cast<size_t>(r) * T + t] > 0.0f)
          wire[r * row + T + E + t / 8] |=
              static_cast<int32_t>(1) << (t % 8);
        const bool end =
            (t == T - 1) || (b->reset[static_cast<size_t>(r) * T + t + 1] > 0.0f);
        if (end) {
          if (ends == E) {
            b->kind = 0;
            return;
          }
          wire[r * row + T + ends] = b->targets[static_cast<size_t>(r) * T + t];
          ++ends;
        }
      }
    }
    b->kind = 1;
    b->wire = std::move(wire);
  }

  void run() {
    while (!stop.load(std::memory_order_relaxed)) {
      SessionBatch b;
      fill(&b);
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] { return ready.size() < capacity || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(b));
      cv_get.notify_one();
    }
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

// ---- session-parallel stream --------------------------------------------

// restore_epoch < 0 means a fresh stream; otherwise (restore_epoch,
// restore_pos, restore_lanes[3B]) is a snapshot from srs_next to resume at.
void* srs_create(const int32_t* items, int64_t num_items,
                 const int64_t* offsets, int64_t num_offsets,
                 int batch_size, int window, int ends_budget,
                 uint64_t seed, int shard_index, int shard_count,
                 int hold_out, int prefetch,
                 int64_t restore_epoch, int64_t restore_pos,
                 const int64_t* restore_lanes) {
  auto* L = new SessionLoader();
  L->items.assign(items, items + num_items);
  L->offsets.assign(offsets, offsets + num_offsets);
  L->batch_size = batch_size;
  L->window = window;
  L->ends_budget = ends_budget;
  L->words = (window + 7) / 8;
  L->seed = seed;
  L->shard_index = shard_index;
  L->shard_count = shard_count < 1 ? 1 : shard_count;
  L->hold_out = hold_out;
  L->capacity = prefetch < 1 ? 1 : static_cast<size_t>(prefetch);
  bool any = false;
  for (int u = 0; u < L->num_users(); ++u)
    if (u % L->shard_count == shard_index % L->shard_count) {
      L->users.push_back(u);
      any = any || L->train_len(u) >= 2;
    }
  if (L->users.empty() || !any) {  // would spin forever drawing sessions
    delete L;
    return nullptr;
  }
  L->rng.seed(seed);
  L->lanes.assign(batch_size, SessionLoader::Lane{});
  if (restore_epoch >= 0) {
    // Re-draw permutations to reproduce the rng state at the snapshot
    // (shuffles are the only rng use), then reload lane cursors.
    for (int64_t e = 0; e < restore_epoch; ++e) L->reshuffle();
    L->reshuffle();
    L->epoch = restore_epoch;
    L->pos = static_cast<size_t>(restore_pos);
    for (int r = 0; r < batch_size; ++r) {
      int64_t u = restore_lanes[3 * r];
      if (u >= 0)
        L->lanes[r] = SessionLoader::Lane{
            static_cast<int>(u), restore_lanes[3 * r + 1],
            restore_lanes[3 * r + 2] != 0, true};
    }
  } else {
    L->reshuffle();
  }
  L->worker = std::thread([L] { L->run(); });
  return L;
}

// Blocks until a batch is ready. Always writes snap[2 + 3B]. Returns 1 and
// writes wire[B*(T+E+W)] when the window packed, 0 and writes
// inputs/targets/reset[B*T] when it exceeded the boundary budget, -1 when
// stopped.
int srs_next(void* handle, int32_t* wire, int32_t* inputs, int32_t* targets,
             float* reset, int64_t* snap) {
  auto* L = static_cast<SessionLoader*>(handle);
  SessionBatch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_get.wait(lk, [&] { return !L->ready.empty() || L->stop.load(); });
    if (L->ready.empty()) return -1;
    b = std::move(L->ready.front());
    L->ready.pop();
    L->cv_put.notify_one();
  }
  std::memcpy(snap, b.snap.data(), b.snap.size() * sizeof(int64_t));
  if (b.kind == 1) {
    std::memcpy(wire, b.wire.data(), b.wire.size() * sizeof(int32_t));
    return 1;
  }
  std::memcpy(inputs, b.inputs.data(), b.inputs.size() * sizeof(int32_t));
  std::memcpy(targets, b.targets.data(), b.targets.size() * sizeof(int32_t));
  std::memcpy(reset, b.reset.data(), b.reset.size() * sizeof(float));
  return 0;
}

void srs_destroy(void* handle) {
  auto* L = static_cast<SessionLoader*>(handle);
  L->stop.store(true);
  L->cv_put.notify_all();
  L->cv_get.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

}  // extern "C"
