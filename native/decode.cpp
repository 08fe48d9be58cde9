// Native video decode pipeline for facerec-tpu.
//
// N worker threads each own a demuxer/decoder instance and claim
// fixed-size frame blocks round-robin (block index = atomic counter);
// blocks are delivered to the Python host strictly in order through a
// bounded reorder window.  With one worker this degenerates to the
// classic double-buffered sequential decode (a worker only seeks when
// its claimed block is not contiguous with what it just decoded).
//
// Rationale: one TPU chip sustains thousands of frames/sec through the
// fused extract program, so host-side decode is the production
// bottleneck — the reference solves this with 100 SLURM processes
// (/root/reference/scripts/extract.sh:12); here the same frame-range
// parallelism lives inside one process as decoder threads
// (cf. /root/reference/facerec/extract.py:281-300, which decodes
// synchronously one frame at a time).
//
// C ABI (ctypes-friendly):
//   frd_open(path, display_w, display_h, block_frames, ring_blocks,
//            n_workers, pixfmt)              (n_workers<=0: auto)
//     pixfmt 0 = RGB24 (h*w*3 bytes/frame), 1 = I420 planar 4:2:0
//     (h*3/2*w bytes/frame; even display dims required) — the wire
//     format facerec_tpu.ops.yuv decodes on device, produced here in
//     the GIL-free worker threads so the Python loop never pays the
//     color conversion
//   frd_info(handle, out_int64[4])   -> n_frames, width, height, fps_x1000
//   frd_start(handle, begin_frame, end_frame)
//   frd_next_block(handle, buf, out_first_frame) -> frames in block (0 = end)
//   frd_close(handle)
//
// Build: make -C native   (g++ + OpenCV videoio/imgproc)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct Block {
  int64_t first_frame = 0;
  int n_frames = 0;
  std::vector<uint8_t> data;  // block_frames * h * w * 3
};

struct Decoder {
  std::string path;
  cv::VideoCapture probe;
  int display_w = 0;
  int display_h = 0;
  int block_frames = 0;
  int64_t ring_blocks = 0;
  int n_workers = 1;
  int pixfmt = 0;  // 0 = RGB24, 1 = I420

  size_t frame_bytes() const {
    const size_t px = static_cast<size_t>(display_w) * display_h;
    return pixfmt == 1 ? px * 3 / 2 : px * 3;
  }

  int64_t n_frames = 0;
  int storage_w = 0;
  int storage_h = 0;
  double fps = 0.0;

  int64_t begin_ = 0, end_ = 0;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits: next block present
  std::condition_variable cv_space;   // workers wait: reorder window space
  std::map<int64_t, std::unique_ptr<Block>> ready;  // block idx -> block
  int64_t next_emit = 0;              // next block idx for the consumer
  std::atomic<int64_t> next_claim{0};
  std::atomic<bool> stop{false};
  int active_workers = 0;
  std::atomic<int> open_failures{0};
  bool drained = false;               // short/failed block seen: stop after

  ~Decoder() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& w : workers)
      if (w.joinable()) w.join();
    workers.clear();
    probe.release();
  }

  int expected_frames(int64_t idx) const {
    const int64_t first = begin_ + idx * block_frames;
    const int64_t want = std::min<int64_t>(block_frames, end_ - first);
    return static_cast<int>(want);
  }

  void worker_loop() {
    cv::VideoCapture cap;
    if (!cap.open(path)) {
      open_failures.fetch_add(1);
      finish_worker();
      return;
    }
    const size_t fbytes = frame_bytes();
    int64_t pos = -1;  // frame index the capture will read next
    cv::Mat bgr, resized, out;
    while (!stop.load()) {
      {
        // Stop claiming once the consumer saw a short block (decode
        // failure / true end): everything later would be discarded.
        std::lock_guard<std::mutex> lk(mu);
        if (drained) break;
      }
      const int64_t idx = next_claim.fetch_add(1);
      const int64_t first = begin_ + idx * block_frames;
      if (first >= end_) break;
      {
        // Bounded reorder window: never run more than ring_blocks ahead
        // of the consumer.
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || drained || idx < next_emit + ring_blocks;
        });
        if (stop.load() || drained) break;
      }
      if (pos != first) {
        cap.set(cv::CAP_PROP_POS_FRAMES, static_cast<double>(first));
        pos = first;
      }
      auto block = std::make_unique<Block>();
      block->first_frame = first;
      block->data.resize(static_cast<size_t>(block_frames) * fbytes);
      const int64_t end_here = std::min<int64_t>(first + block_frames, end_);
      int got = 0;
      while (pos < end_here) {
        if (!cap.read(bgr)) break;
        cv::Mat* src = &bgr;
        if (bgr.cols != display_w || bgr.rows != display_h) {
          cv::resize(bgr, resized, cv::Size(display_w, display_h));
          src = &resized;
        }
        cv::cvtColor(*src, out, pixfmt == 1 ? cv::COLOR_BGR2YUV_I420
                                            : cv::COLOR_BGR2RGB);
        std::memcpy(block->data.data() + got * fbytes, out.data,
                    fbytes);
        ++got;
        ++pos;
      }
      block->n_frames = got;
      {
        std::lock_guard<std::mutex> lk(mu);
        ready[idx] = std::move(block);
      }
      cv_ready.notify_all();
    }
    cap.release();
    finish_worker();
  }

  void finish_worker() {
    {
      std::lock_guard<std::mutex> lk(mu);
      --active_workers;
    }
    cv_ready.notify_all();
  }
};

}  // namespace

extern "C" {

void* frd_open(const char* path, int display_w, int display_h,
               int block_frames, int ring_blocks, int n_workers,
               int pixfmt) {
  auto d = std::make_unique<Decoder>();
  d->path = path;
  d->pixfmt = pixfmt;
  if (!d->probe.open(d->path)) return nullptr;
  d->n_frames = static_cast<int64_t>(d->probe.get(cv::CAP_PROP_FRAME_COUNT));
  if (d->n_frames <= 0) return nullptr;
  d->storage_w = static_cast<int>(d->probe.get(cv::CAP_PROP_FRAME_WIDTH));
  d->storage_h = static_cast<int>(d->probe.get(cv::CAP_PROP_FRAME_HEIGHT));
  d->fps = d->probe.get(cv::CAP_PROP_FPS);
  d->display_w = display_w > 0 ? display_w : d->storage_w;
  d->display_h = display_h > 0 ? display_h : d->storage_h;
  if (pixfmt == 1 && (d->display_w % 2 || d->display_h % 2))
    return nullptr;  // I420 needs even dims (caller falls back to RGB)
  d->block_frames = block_frames;
  // Default to sequential decode: parallel workers seek per claimed
  // block (CAP_PROP_POS_FRAMES), which is frame-accurate for
  // closed-GOP content (the same assumption the shard model already
  // makes when seeking to a shard start) but not guaranteed for every
  // codec/container — so >1 worker is opt-in via the Python wrapper /
  // FACEREC_DECODE_WORKERS.
  if (n_workers <= 0) n_workers = 1;
  d->n_workers = n_workers;
  const int64_t min_ring = static_cast<int64_t>(n_workers) + 1;
  d->ring_blocks = ring_blocks > min_ring ? ring_blocks : min_ring;
  return d.release();
}

void frd_info(void* handle, int64_t* out4) {
  auto* d = static_cast<Decoder*>(handle);
  out4[0] = d->n_frames;
  out4[1] = d->storage_w;
  out4[2] = d->storage_h;
  out4[3] = static_cast<int64_t>(d->fps * 1000.0 + 0.5);
}

void frd_start(void* handle, int64_t begin, int64_t end) {
  auto* d = static_cast<Decoder*>(handle);
  d->begin_ = begin;
  d->end_ = end;
  d->active_workers = d->n_workers;
  for (int i = 0; i < d->n_workers; ++i)
    d->workers.emplace_back([d] { d->worker_loop(); });
}

int frd_next_block(void* handle, uint8_t* buf, int64_t* out_first_frame) {
  auto* d = static_cast<Decoder*>(handle);
  std::unique_ptr<Block> block;
  {
    std::unique_lock<std::mutex> lk(d->mu);
    if (d->drained) return 0;
    d->cv_ready.wait(lk, [&] {
      return d->ready.count(d->next_emit) || d->active_workers == 0 ||
             d->stop.load();
    });
    auto it = d->ready.find(d->next_emit);
    if (it == d->ready.end()) {
      // Distinguish "range exhausted" from "no worker could even open
      // the file" — the latter must be an error, not an empty film.
      if (d->open_failures.load() == d->n_workers && d->next_emit == 0)
        return -1;
      return 0;  // all workers done, nothing next
    }
    block = std::move(it->second);
    d->ready.erase(it);
    // A short block means decode failed mid-range (or hit the true end
    // of the file): emit it, then stop — matching sequential behavior.
    if (block->n_frames < d->expected_frames(d->next_emit)) d->drained = true;
    ++d->next_emit;
  }
  d->cv_space.notify_all();
  if (block->n_frames == 0) return 0;
  std::memcpy(buf, block->data.data(),
              block->n_frames * d->frame_bytes());
  *out_first_frame = block->first_frame;
  return block->n_frames;
}

void frd_close(void* handle) {
  delete static_cast<Decoder*>(handle);
}

// Out-of-place per-block temporal delta (uint8 wraparound): dst[0] =
// src[0], dst[i] = src[i] - src[i-1].  The wire encode of the
// rgb-delta / yuv420-delta formats (facerec_tpu.ops.yuv.encode_delta):
// numpy pays ~15 ns/byte for the same subtraction on the Python loop's
// single core; this runs it GIL-free across a few threads at memory
// bandwidth (the source frames stay untouched for the host pixel
// window / JPEG path).
void frd_delta_u8(const uint8_t* src, uint8_t* dst, int64_t n_frames,
                  int64_t frame_bytes) {
  if (n_frames <= 0) return;
  std::memcpy(dst, src, frame_bytes);
  const int64_t rest = n_frames - 1;
  if (rest == 0) return;
  int n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads > 4) n_threads = 4;
  if (n_threads < 1) n_threads = 1;
  if (rest < n_threads) n_threads = static_cast<int>(rest);
  std::vector<std::thread> workers;
  const int64_t chunk = (rest + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = 1 + t * chunk;
    const int64_t hi = std::min<int64_t>(1 + (t + 1) * chunk, n_frames);
    if (lo >= hi) break;
    workers.emplace_back([=] {
      for (int64_t i = lo; i < hi; ++i) {
        const uint8_t* cur = src + i * frame_bytes;
        const uint8_t* prev = src + (i - 1) * frame_bytes;
        uint8_t* out = dst + i * frame_bytes;
        for (int64_t b = 0; b < frame_bytes; ++b)
          out[b] = static_cast<uint8_t>(cur[b] - prev[b]);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
