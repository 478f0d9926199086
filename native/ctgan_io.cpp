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
#include <mutex>
#include <queue>
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
};

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
  std::queue<Batch*> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  size_t max_depth = 4;
  std::atomic<bool> stop{false};
  int64_t cursor = 0;   // global sample cursor (for deterministic order)
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
  void claim(std::vector<int64_t>& idx, uint64_t& aug_seed) {
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
    cursor += per;
  }

  void fill(Batch* b) {
    std::vector<int64_t> idx;
    uint64_t aug_seed;
    claim(idx, aug_seed);
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
    while (!stop.load()) {
      Batch* b = new Batch();
      fill(b);
      std::unique_lock<std::mutex> l(mu);
      cv_space.wait(l, [&] { return ready.size() < max_depth || stop.load(); });
      if (stop.load()) { delete b; return; }
      ready.push(b);
      cv_ready.notify_one();
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
// buffers.  Blocks until a batch is ready.
int ctgan_pipeline_next(void* handle, float* images_out, int64_t* labels_out) {
  auto* p = (Pipeline*)handle;
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> l(p->mu);
    p->cv_ready.wait(l, [&] { return !p->ready.empty() || p->stop.load(); });
    if (p->stop.load() && p->ready.empty()) return -1;
    b = p->ready.front();
    p->ready.pop();
    p->cv_space.notify_one();
  }
  std::memcpy(images_out, b->images.data(), b->images.size() * sizeof(float));
  if (labels_out)
    std::memcpy(labels_out, b->labels.data(), b->labels.size() * sizeof(int64_t));
  delete b;
  return 0;
}

int64_t ctgan_pipeline_cursor(void* handle) {
  auto* p = (Pipeline*)handle;
  std::lock_guard<std::mutex> l(p->cursor_mu);
  return p->cursor;
}

void ctgan_pipeline_seek(void* handle, int64_t cursor) {
  auto* p = (Pipeline*)handle;
  std::lock_guard<std::mutex> l(p->cursor_mu);
  p->cursor = cursor;
  p->epoch = -1;  // force reshuffle at next claim
}

void ctgan_pipeline_destroy(void* handle) {
  auto* p = (Pipeline*)handle;
  p->stop.store(true);
  p->cv_ready.notify_all();
  p->cv_space.notify_all();
  for (auto& t : p->workers) t.join();
  while (!p->ready.empty()) {
    delete p->ready.front();
    p->ready.pop();
  }
  delete p;
}

}  // extern "C"
