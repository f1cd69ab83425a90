// pipeline: native batch executor for the input pipeline.
//
// The DALI-executor role (SURVEY.md §2.3): a persistent C++ worker pool that
// decodes a whole batch of JPEGs (fused scaled-decode + crop + resample from
// imgpipe.cpp) into a caller-provided contiguous buffer with ONE Python call
// per batch — instead of one Python future per image. Designed for
// double-buffering: submit batch N+1, then wait on batch N.
//
//   handle = pp_create(num_workers)
//   pp_submit(handle, ticket, n, jpeg_ptrs, jpeg_lens, crops /*n*4*/,
//             filts /*n*/, out, out_w, out_h)       // non-blocking
//   failures = pp_wait(handle, ticket, fail_idx_out /*cap n*/)
//   pp_destroy(handle)
//
// Failed decodes (non-JPEG etc.) are reported back so Python can re-decode
// those few via PIL; their output slots are zeroed.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" int ip_decode_crop_resize(const uint8_t*, size_t, int, int, int, int, int, int,
                                     int, uint8_t*);
extern "C" int ip_decode_crop_scaled(const uint8_t*, size_t, int, int, int, int, int, int,
                                     int, int, uint8_t*, int*, int*);

namespace {

struct Task {
  const uint8_t* data;
  size_t len;
  int crop[4];
  int filt;
  uint8_t* out;
  int out_w, out_h;   // resize target (mode 0) / decode target (mode 1)
  int max_w, max_h;   // mode 1: canvas dims (out stride = max_w*3)
  int* dims;          // mode 1: (h, w) valid extent, written per task
  int mode;           // 0 = decode+crop+resize, 1 = scaled decode, no resample
  int index;
  uint64_t ticket;
};

struct Batch {
  std::atomic<int> remaining{0};
  std::vector<int> failures;
  std::mutex fail_mu;
  bool done() const { return remaining.load(std::memory_order_acquire) == 0; }
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Task> tasks;
  std::mutex mu;
  std::condition_variable cv;       // workers wait for tasks
  std::condition_variable done_cv;  // waiters wait for batch completion
  std::unordered_map<uint64_t, Batch*> batches;
  bool stop = false;

  void worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !tasks.empty(); });
        if (stop && tasks.empty()) return;
        t = tasks.front();
        tasks.pop_front();
      }
      int rc;
      if (t.mode == 1) {
        int sw = 0, sh = 0;
        rc = ip_decode_crop_scaled(t.data, t.len, t.crop[0], t.crop[1], t.crop[2], t.crop[3],
                                   t.out_w, t.out_h, t.max_w, t.max_h, t.out, &sw, &sh);
        // failed slots report the full target so the Python PIL fallback can
        // overwrite them in place with (tgt_h, tgt_w) content
        t.dims[0] = rc == 0 ? sh : t.out_h;
        t.dims[1] = rc == 0 ? sw : t.out_w;
      } else {
        rc = ip_decode_crop_resize(t.data, t.len, t.crop[0], t.crop[1], t.crop[2], t.crop[3],
                                   t.out_w, t.out_h, t.filt, t.out);
      }
      Batch* b;
      {
        std::lock_guard<std::mutex> lk(mu);
        b = batches.at(t.ticket);
      }
      if (rc != 0) {
        const size_t slot = t.mode == 1 ? static_cast<size_t>(t.max_w) * t.max_h * 3
                                        : static_cast<size_t>(t.out_w) * t.out_h * 3;
        memset(t.out, 0, slot);
        std::lock_guard<std::mutex> lk(b->fail_mu);
        b->failures.push_back(t.index);
      }
      if (b->remaining.fetch_sub(1, std::memory_order_acq_rel) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        done_cv.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* pp_create(int num_workers) {
  Pool* p = new Pool();
  if (num_workers < 1) num_workers = 1;
  for (int i = 0; i < num_workers; ++i) p->workers.emplace_back([p] { p->worker(); });
  return p;
}

void pp_destroy(void* handle) {
  Pool* p = static_cast<Pool*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto& kv : p->batches) delete kv.second;
  delete p;
}

// Non-blocking submit of one batch under `ticket` (must be unique until waited).
// crops: n*4 ints (x,y,w,h; all zero = full image); filts: n ints (0 tri, 1 cubic);
// out: contiguous n*out_h*out_w*3 uint8.
int pp_submit(void* handle, uint64_t ticket, int n, const uint8_t** jpeg_ptrs,
              const size_t* jpeg_lens, const int* crops, const int* filts, uint8_t* out,
              int out_w, int out_h) {
  Pool* p = static_cast<Pool*>(handle);
  Batch* b = new Batch();
  b->remaining.store(n, std::memory_order_release);
  const size_t img_bytes = static_cast<size_t>(out_w) * out_h * 3;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->batches.count(ticket)) return -1;
    p->batches[ticket] = b;
    for (int i = 0; i < n; ++i) {
      Task t;
      t.data = jpeg_ptrs[i];
      t.len = jpeg_lens[i];
      memcpy(t.crop, crops + 4 * i, sizeof(t.crop));
      t.filt = filts[i];
      t.out = out + img_bytes * i;
      t.out_w = out_w;
      t.out_h = out_h;
      t.max_w = t.max_h = 0;
      t.dims = nullptr;
      t.mode = 0;
      t.index = i;
      t.ticket = ticket;
      p->tasks.push_back(t);
    }
  }
  p->cv.notify_all();
  return 0;
}

// Scaled-decode batch submit (device-side resample split): each image is
// decoded at the best DCT scale for a (tgt_w, tgt_h) final size into its
// (max_h, max_w, 3) canvas slot of `out`; dims (n*2 ints, h then w) receives
// each slot's valid extent. filts are not used here (the interpolation
// happens on the device) but failed slots still report to the caller.
int pp_submit_scaled(void* handle, uint64_t ticket, int n, const uint8_t** jpeg_ptrs,
                     const size_t* jpeg_lens, const int* crops, int tgt_w, int tgt_h,
                     uint8_t* out, int max_w, int max_h, int* dims) {
  Pool* p = static_cast<Pool*>(handle);
  Batch* b = new Batch();
  b->remaining.store(n, std::memory_order_release);
  const size_t img_bytes = static_cast<size_t>(max_w) * max_h * 3;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->batches.count(ticket)) return -1;
    p->batches[ticket] = b;
    for (int i = 0; i < n; ++i) {
      Task t;
      t.data = jpeg_ptrs[i];
      t.len = jpeg_lens[i];
      memcpy(t.crop, crops + 4 * i, sizeof(t.crop));
      t.filt = 0;
      t.out = out + img_bytes * i;
      t.out_w = tgt_w;
      t.out_h = tgt_h;
      t.max_w = max_w;
      t.max_h = max_h;
      t.dims = dims + 2 * i;
      t.mode = 1;
      t.index = i;
      t.ticket = ticket;
      p->tasks.push_back(t);
    }
  }
  p->cv.notify_all();
  return 0;
}

// Blocks until the ticket's batch completes. Writes failed indices into
// fail_out (capacity >= n) and returns the failure count; -1 if unknown ticket.
int pp_wait(void* handle, uint64_t ticket, int* fail_out) {
  Pool* p = static_cast<Pool*>(handle);
  Batch* b;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    auto it = p->batches.find(ticket);
    if (it == p->batches.end()) return -1;
    b = it->second;
    p->done_cv.wait(lk, [&] { return b->done(); });
    p->batches.erase(it);
  }
  int nf = static_cast<int>(b->failures.size());
  for (int i = 0; i < nf; ++i) fail_out[i] = b->failures[i];
  delete b;
  return nf;
}

}  // extern "C"
