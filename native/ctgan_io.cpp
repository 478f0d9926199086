// ctgan_io — native host-side data runtime for ctgan_tpu.
//
// The reference's data path is pure-Python generators feeding feed_dict
// (tflib/mnist.py, cifar10.py, LSUN_bedrooms/tflib/imagenet.py).  On TPU the
// host must keep ahead of a ~30ms fused train step; this library provides the
// throughput-critical host pieces as native code behind a C ABI (ctypes on
// the Python side, ctgan_tpu/data/native.py):
//
//   * decoders: MNIST IDX and CIFAR-10 binary record formats
//   * BatchPipeline: multi-threaded shuffled epoch batcher over a pinned
//     uint8 dataset with optional per-image horizontal flip and
//     uint8 -> float32 [-1,1] conversion, double-buffered so the next
//     stacked [K,B,D] batch is materialized while the device steps
//   * deterministic per-epoch permutations (seed, epoch) so resume is O(1)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libctgan_io.so ctgan_io.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- decoders

// MNIST IDX (idx3-ubyte / idx1-ubyte): big-endian magic + dims, then bytes.
// Returns 0 on success; fills dims[0..2] (n, rows, cols) and copies payload
// into out (caller sized).  If out == nullptr, only dims are filled.
int ctgan_decode_idx(const uint8_t* data, int64_t len, int64_t* dims,
                     uint8_t* out) {
  if (len < 4) return -1;
  uint32_t magic = (data[0] << 24) | (data[1] << 16) | (data[2] << 8) | data[3];
  int ndim = magic & 0xff;
  if (((magic >> 8) & 0xff) != 0x08 || ndim < 1 || ndim > 3) return -2;
  if (len < 4 + 4 * ndim) return -1;
  int64_t total = 1;
  for (int i = 0; i < ndim; i++) {
    const uint8_t* p = data + 4 + 4 * i;
    int64_t d = ((int64_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
    dims[i] = d;
    total *= d;
  }
  for (int i = ndim; i < 3; i++) dims[i] = 1;
  if (len < 4 + 4 * ndim + total) return -1;
  if (out) std::memcpy(out, data + 4 + 4 * ndim, total);
  return 0;
}

// CIFAR-10 binary records: [label u8][3072 pixel u8] * n.
// Splits into images [n,3072] and labels [n].
int ctgan_decode_cifar_bin(const uint8_t* data, int64_t len, uint8_t* images,
                           int64_t* labels, int64_t* n_out) {
  const int64_t rec = 3073;
  if (len % rec != 0) return -1;
  int64_t n = len / rec;
  for (int64_t i = 0; i < n; i++) {
    labels[i] = data[i * rec];
    std::memcpy(images + i * 3072, data + i * rec + 1, 3072);
  }
  *n_out = n;
  return 0;
}

// ------------------------------------------------------------ batch pipeline

struct Batch {
  std::vector<float> images;   // [k*b*item] normalized
  std::vector<int64_t> labels; // [k*b]
  int64_t ticket = 0;          // claim cursor — delivery is in ticket order
  uint64_t gen = 0;            // seek generation at claim time
};

// Determinism contract: delivered batch order is a pure function of
// (seed, cursor) regardless of n_threads.  Workers claim contiguous cursor
// ranges (tickets) in order, fill out-of-order, but ctgan_pipeline_next
// delivers strictly in ticket order; cursor() reports the CONSUMED cursor,
// and seek() bumps a generation so in-flight/prefetched stale batches are
// discarded instead of being delivered.
struct Pipeline {
  const uint8_t* data = nullptr;  // [n, item] borrowed
  const int64_t* labels = nullptr;  // [n] borrowed (optional)
  int64_t n = 0, item = 0;
  int batch = 0, k = 1;
  int channels = 1, height = 0, width = 0;
  uint64_t seed = 0;
  bool flip = false;
  float scale = 1.0f, shift = 0.0f;  // out = px*scale + shift

  std::vector<std::thread> workers;
  std::map<int64_t, Batch*> ready;  // ticket -> batch
  std::mutex mu;                    // guards ready, consumed, cv waits
  std::condition_variable cv_ready, cv_space;
  size_t max_depth = 4;
  std::atomic<bool> stop{false};
  int64_t cursor = 0;    // producer claim cursor (samples)
  int64_t consumed = 0;  // consumer cursor (samples), guarded by mu
  uint64_t gen = 0;      // seek generation, written under cursor_mu+mu
  std::mutex cursor_mu;

  std::vector<int64_t> perm;
  int64_t epoch = -1;

  void reshuffle(int64_t e) {
    perm.resize(n);
    for (int64_t i = 0; i < n; i++) perm[i] = i;
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)e + 1);
    for (int64_t i = n - 1; i > 0; i--) {
      int64_t j = (int64_t)(rng() % (uint64_t)(i + 1));
      std::swap(perm[i], perm[j]);
    }
    epoch = e;
  }

  // Claim the next [k*batch] contiguous permuted slots; reshuffle per epoch.
  void claim(std::vector<int64_t>& idx, uint64_t& aug_seed, int64_t& ticket,
             uint64_t& g) {
    std::lock_guard<std::mutex> l(cursor_mu);
    int64_t per = (int64_t)k * batch;
    int64_t per_epoch = (n / per) * per;
    if (per_epoch == 0) per_epoch = per;  // tiny datasets wrap
    int64_t e = cursor / per_epoch;
    int64_t off = cursor % per_epoch;
    if (e != epoch) reshuffle(e);
    idx.resize(per);
    for (int64_t i = 0; i < per; i++) idx[i] = perm[(off + i) % n];
    aug_seed = seed ^ (uint64_t)cursor * 0xD1B54A32D192ED03ULL;
    ticket = cursor;
    g = gen;
    cursor += per;
  }

  void fill(Batch* b) {
    std::vector<int64_t> idx;
    uint64_t aug_seed;
    claim(idx, aug_seed, b->ticket, b->gen);
    std::mt19937_64 rng(aug_seed);
    int64_t per = (int64_t)k * batch;
    b->images.resize(per * item);
    b->labels.resize(per);
    int64_t hw = (int64_t)height * width;
    for (int64_t i = 0; i < per; i++) {
      const uint8_t* src = data + idx[i] * item;
      float* dst = b->images.data() + i * item;
      bool do_flip = flip && (rng() & 1);
      if (do_flip && hw * channels == item && width > 0) {
        // horizontal flip per channel plane (C-major layout)
        for (int c = 0; c < channels; c++)
          for (int y = 0; y < height; y++) {
            const uint8_t* row = src + c * hw + (int64_t)y * width;
            float* drow = dst + c * hw + (int64_t)y * width;
            for (int x = 0; x < width; x++)
              drow[x] = row[width - 1 - x] * scale + shift;
          }
      } else {
        for (int64_t j = 0; j < item; j++) dst[j] = src[j] * scale + shift;
      }
      b->labels[i] = labels ? labels[idx[i]] : 0;
    }
  }

  void worker() {
    int64_t per = (int64_t)k * batch;
    while (!stop.load()) {
      Batch* b = new Batch();
      fill(b);
      std::unique_lock<std::mutex> l(mu);
      // Window flow control keyed on the consumer cursor: a batch whose
      // ticket is within max_depth batches of `consumed` may always land —
      // this cannot deadlock because tickets are claimed in order, so the
      // batch the consumer is waiting on is always inside the window.
      cv_space.wait(l, [&] {
        return stop.load() || b->gen != gen ||
               b->ticket < consumed + (int64_t)max_depth * per;
      });
      if (stop.load()) { delete b; return; }
      if (b->gen != gen) { delete b; continue; }  // stale after seek
      ready[b->ticket] = b;
      cv_ready.notify_all();
    }
  }
};

void* ctgan_pipeline_create(const uint8_t* data, const int64_t* labels,
                            int64_t n, int64_t item, int batch, int k,
                            int channels, int height, int width, int flip,
                            float scale, float shift, uint64_t seed,
                            int n_threads, int depth) {
  auto* p = new Pipeline();
  p->data = data;
  p->labels = labels;
  p->n = n;
  p->item = item;
  p->batch = batch;
  p->k = k;
  p->channels = channels;
  p->height = height;
  p->width = width;
  p->flip = flip != 0;
  p->scale = scale;
  p->shift = shift;
  p->seed = seed;
  p->max_depth = depth > 0 ? (size_t)depth : 4;
  int nt = n_threads > 0 ? n_threads : 1;
  for (int i = 0; i < nt; i++)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Copies the next [k*batch, item] float32 batch (and labels) into caller
// buffers.  Blocks until the IN-ORDER next batch (ticket == consumed cursor)
// is ready — multi-worker output is therefore deterministic.
int ctgan_pipeline_next(void* handle, float* images_out, int64_t* labels_out) {
  auto* p = (Pipeline*)handle;
  Batch* b = nullptr;
  int64_t per = (int64_t)p->k * p->batch;
  {
    std::unique_lock<std::mutex> l(p->mu);
    p->cv_ready.wait(l, [&] {
      return p->ready.count(p->consumed) != 0 || p->stop.load();
    });
    if (p->ready.count(p->consumed) == 0) return -1;  // stopped
    auto it = p->ready.find(p->consumed);
    b = it->second;
    p->ready.erase(it);
    p->consumed += per;
    p->cv_space.notify_all();
  }
  std::memcpy(images_out, b->images.data(), b->images.size() * sizeof(float));
  if (labels_out)
    std::memcpy(labels_out, b->labels.data(), b->labels.size() * sizeof(int64_t));
  delete b;
  return 0;
}

// Reports the CONSUMED cursor (what the caller has actually received), not
// the producer claim cursor — saving this value and seeking to it on resume
// reproduces the exact delivered batch sequence.
int64_t ctgan_pipeline_cursor(void* handle) {
  auto* p = (Pipeline*)handle;
  std::lock_guard<std::mutex> l(p->mu);
  return p->consumed;
}

void ctgan_pipeline_seek(void* handle, int64_t cursor) {
  auto* p = (Pipeline*)handle;
  std::lock_guard<std::mutex> lc(p->cursor_mu);
  std::lock_guard<std::mutex> lm(p->mu);
  p->cursor = cursor;
  p->consumed = cursor;
  p->epoch = -1;  // force reshuffle at next claim
  p->gen++;       // stale in-flight/prefetched batches get discarded
  for (auto& kv : p->ready) delete kv.second;
  p->ready.clear();
  p->cv_space.notify_all();
}

void ctgan_pipeline_destroy(void* handle) {
  auto* p = (Pipeline*)handle;
  p->stop.store(true);
  p->cv_ready.notify_all();
  p->cv_space.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto& kv : p->ready) delete kv.second;
  p->ready.clear();
  delete p;
}

}  // extern "C"
