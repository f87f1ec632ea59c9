// Native training-data loader: multithreaded prefetch of video clips from a
// packed binary shard into float32 host batches ready for device transfer.
//
// The reference has no data-loading runtime at all (inference-only demos);
// this supplies the native side of the training pipeline added in
// training/: worker threads read uint8 [T,H,W,C] clips from a memory-mapped
// shard, optionally random-crop and horizontally flip them, convert to
// float32 in [0,1] CHW layout, and publish complete batches into a bounded
// ring buffer the Python side drains via ctypes (zero Python work per pixel).
//
// Shard format (written by data/shards.py):
//   magic 'CWMSHARD' | u32 version | u32 num_clips
//   | u32 T | u32 H | u32 W | u32 C            (fixed clip shape)
//   | num_clips * (T*H*W*C) bytes of uint8 payload
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread clip_loader.cpp -o ...

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct ShardHeader {
  char magic[8];
  uint32_t version;
  uint32_t num_clips;
  uint32_t t, h, w, c;
};

struct Batch {
  std::vector<float> data;
  std::vector<uint32_t> clip_ids;  // source clip index per batch row
  uint64_t epoch;
  uint64_t index;
};

class ClipLoader {
 public:
  ClipLoader(const char* path, int batch_size, int crop_h, int crop_w,
             int num_threads, int prefetch, uint64_t seed, bool hflip,
             bool shuffle)
      : batch_size_(batch_size),
        crop_h_(crop_h),
        crop_w_(crop_w),
        prefetch_(prefetch),
        hflip_(hflip),
        shuffle_(shuffle),
        seed_(seed) {
    fd_ = open(path, O_RDONLY);
    if (fd_ < 0) { ok_ = false; return; }
    struct stat st;
    fstat(fd_, &st);
    size_ = static_cast<size_t>(st.st_size);
    base_ = static_cast<const uint8_t*>(
        mmap(nullptr, size_, PROT_READ, MAP_PRIVATE, fd_, 0));
    if (base_ == MAP_FAILED) { ok_ = false; return; }
    std::memcpy(&hdr_, base_, sizeof(ShardHeader));
    if (std::memcmp(hdr_.magic, "CWMSHARD", 8) != 0) { ok_ = false; return; }
    payload_ = base_ + sizeof(ShardHeader);
    clip_bytes_ = static_cast<size_t>(hdr_.t) * hdr_.h * hdr_.w * hdr_.c;
    if (crop_h_ <= 0) crop_h_ = hdr_.h;
    if (crop_w_ <= 0) crop_w_ = hdr_.w;
    ok_ = (sizeof(ShardHeader) + clip_bytes_ * hdr_.num_clips <= size_) &&
          hdr_.num_clips > 0 &&  // N=0 would divide by zero in the workers
          crop_h_ <= static_cast<int>(hdr_.h) &&
          crop_w_ <= static_cast<int>(hdr_.w);
    if (!ok_) return;
    stop_.store(false);
    for (int i = 0; i < num_threads; ++i) {
      workers_.emplace_back([this, i] { worker_loop(i); });
    }
  }

  ~ClipLoader() {
    stop_.store(true);
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& t : workers_) t.join();
    if (base_ && base_ != MAP_FAILED) munmap(const_cast<uint8_t*>(base_), size_);
    if (fd_ >= 0) close(fd_);
  }

  bool ok() const { return ok_; }
  uint32_t num_clips() const { return hdr_.num_clips; }
  uint32_t t() const { return hdr_.t; }
  uint32_t c() const { return hdr_.c; }
  int crop_h() const { return crop_h_; }
  int crop_w() const { return crop_w_; }
  int batch_size() const { return batch_size_; }
  size_t batch_elems() const {
    return static_cast<size_t>(batch_size_) * hdr_.t * hdr_.c * crop_h_ *
           crop_w_;
  }

  // Blocking: copy the next ready batch (f32, [B, T, C, crop_h, crop_w])
  // into out; if ids != nullptr also write the B source clip indices
  // (aligns sidecar streams, e.g. the IMU sidecar, with shuffled rows).
  // Returns the global batch index, or -1 on shutdown.
  int64_t next_batch(float* out, uint32_t* ids) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !ready_.empty() || stop_.load(); });
    if (ready_.empty()) return -1;
    Batch b = std::move(ready_.front());
    ready_.pop();
    lk.unlock();
    cv_space_.notify_one();
    std::memcpy(out, b.data.data(), b.data.size() * sizeof(float));
    if (ids != nullptr) {
      std::memcpy(ids, b.clip_ids.data(),
                  b.clip_ids.size() * sizeof(uint32_t));
    }
    return static_cast<int64_t>(b.index);
  }

 private:
  // Materialize the epoch-seeded Fisher-Yates permutation: every epoch
  // visits each clip exactly once in an independent uniform order (the
  // identical permutation is derived by any worker from the epoch alone,
  // so interleaved workers agree without sharing state).
  void epoch_perm(uint64_t epoch, std::vector<uint32_t>& out) const {
    out.resize(hdr_.num_clips);
    for (uint32_t i = 0; i < hdr_.num_clips; ++i) out[i] = i;
    std::mt19937_64 rng(seed_ + epoch * 0x9e3779b97f4a7c15ULL);
    for (uint32_t i = hdr_.num_clips; i > 1; --i) {
      std::swap(out[i - 1], out[rng() % i]);
    }
  }

  // decode one clip into dst (CHW float), with crop offsets and flip
  void decode_clip(uint32_t clip_idx, float* dst, int oy, int ox, bool flip) {
    const uint8_t* src = payload_ + clip_bytes_ * clip_idx;
    const int T = hdr_.t, H = hdr_.h, W = hdr_.w, C = hdr_.c;
    const float inv = 1.0f / 255.0f;
    for (int t = 0; t < T; ++t) {
      const uint8_t* frame = src + static_cast<size_t>(t) * H * W * C;
      for (int ch = 0; ch < C; ++ch) {
        float* plane =
            dst + (static_cast<size_t>(t) * C + ch) * crop_h_ * crop_w_;
        for (int y = 0; y < crop_h_; ++y) {
          const uint8_t* row = frame + (static_cast<size_t>(y + oy) * W) * C;
          float* out_row = plane + static_cast<size_t>(y) * crop_w_;
          if (!flip) {
            for (int x = 0; x < crop_w_; ++x)
              out_row[x] = row[(x + ox) * C + ch] * inv;
          } else {
            for (int x = 0; x < crop_w_; ++x)
              out_row[x] = row[(crop_w_ - 1 - x + ox) * C + ch] * inv;
          }
        }
      }
    }
  }

  void worker_loop(int /*tid*/) {
    const size_t clip_elems =
        static_cast<size_t>(hdr_.t) * hdr_.c * crop_h_ * crop_w_;
    uint64_t cached_ep = ~0ULL;    // this worker's cached epoch_perm
    std::vector<uint32_t> perm;
    while (!stop_.load()) {
      uint64_t my_index = next_index_.fetch_add(1);
      uint64_t epoch = my_index * batch_size_ / hdr_.num_clips;
      Batch b;
      b.index = my_index;
      b.epoch = epoch;
      b.data.resize(batch_elems());
      b.clip_ids.resize(batch_size_);
      std::mt19937_64 rng(seed_ ^ (my_index * 0xda942042e4dd58b5ULL));
      for (int i = 0; i < batch_size_; ++i) {
        uint64_t flat = my_index * batch_size_ + i;
        uint64_t ep = flat / hdr_.num_clips;
        uint32_t pos = static_cast<uint32_t>(flat % hdr_.num_clips);
        uint32_t clip;
        if (shuffle_) {
          // real per-epoch Fisher-Yates order (a previous affine-hash
          // "shuffle" repeated one fixed stride cycle every epoch);
          // rebuilt only when this worker crosses an epoch boundary
          if (ep != cached_ep) {
            epoch_perm(ep, perm);
            cached_ep = ep;
          }
          clip = perm[pos];
        } else {
          clip = pos;
        }
        int oy = (crop_h_ < static_cast<int>(hdr_.h))
                     ? static_cast<int>(rng() % (hdr_.h - crop_h_ + 1))
                     : 0;
        int ox = (crop_w_ < static_cast<int>(hdr_.w))
                     ? static_cast<int>(rng() % (hdr_.w - crop_w_ + 1))
                     : 0;
        bool flip = hflip_ && (rng() & 1);
        b.clip_ids[i] = clip;
        decode_clip(clip, b.data.data() + clip_elems * i, oy, ox, flip);
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] {
        return ready_.size() < static_cast<size_t>(prefetch_) || stop_.load();
      });
      if (stop_.load()) return;
      ready_.push(std::move(b));
      lk.unlock();
      cv_data_.notify_one();
    }
  }

  int fd_ = -1;
  size_t size_ = 0;
  const uint8_t* base_ = nullptr;
  const uint8_t* payload_ = nullptr;
  ShardHeader hdr_{};
  size_t clip_bytes_ = 0;
  bool ok_ = true;

  int batch_size_, crop_h_, crop_w_, prefetch_;
  bool hflip_, shuffle_;
  uint64_t seed_;

  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::queue<Batch> ready_;
  std::atomic<bool> stop_{true};
  std::atomic<uint64_t> next_index_{0};
};

}  // namespace

extern "C" {

void* clip_loader_create(const char* path, int batch_size, int crop_h,
                         int crop_w, int num_threads, int prefetch,
                         uint64_t seed, int hflip, int shuffle) {
  auto* l = new ClipLoader(path, batch_size, crop_h, crop_w, num_threads,
                           prefetch, seed, hflip != 0, shuffle != 0);
  if (!l->ok()) {
    delete l;
    return nullptr;
  }
  return l;
}

void clip_loader_destroy(void* handle) {
  delete static_cast<ClipLoader*>(handle);
}

int64_t clip_loader_next(void* handle, float* out) {
  return static_cast<ClipLoader*>(handle)->next_batch(out, nullptr);
}

// As clip_loader_next, plus the B source clip indices of the batch rows.
int64_t clip_loader_next_ids(void* handle, float* out, uint32_t* ids) {
  return static_cast<ClipLoader*>(handle)->next_batch(out, ids);
}

void clip_loader_shape(void* handle, int* out5) {
  auto* l = static_cast<ClipLoader*>(handle);
  out5[0] = l->batch_size();
  out5[1] = static_cast<int>(l->t());
  out5[2] = static_cast<int>(l->c());
  out5[3] = l->crop_h();
  out5[4] = l->crop_w();
}

uint32_t clip_loader_num_clips(void* handle) {
  return static_cast<ClipLoader*>(handle)->num_clips();
}

}  // extern "C"
