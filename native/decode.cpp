// Native video decode pipeline for facerec-tpu.
//
// A background decode thread fills a bounded ring of fixed-size frame
// blocks (RGB uint8 at display resolution, DAR-resized) while the
// Python host feeds the previous block to the TPU — the decode/compute
// overlap the reference gets from separate SLURM processes happens here
// inside one process (cf. /root/reference/facerec/extract.py:281-300,
// which decodes synchronously per frame).
//
// C ABI (ctypes-friendly):
//   frd_open(path, display_w, display_h, block_frames, ring_blocks)
//   frd_info(handle, out_int64[4])   -> n_frames, width, height, fps_x1000
//   frd_start(handle, begin_frame, end_frame)
//   frd_next_block(handle, buf, out_first_frame) -> frames in block (0 = end)
//   frd_close(handle)
//
// Build: make -C native   (g++ + OpenCV videoio/imgproc)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
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
  cv::VideoCapture cap;
  int display_w = 0;
  int display_h = 0;
  int block_frames = 0;
  size_t ring_blocks = 0;

  int64_t n_frames = 0;
  int storage_w = 0;
  int storage_h = 0;
  double fps = 0.0;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits: block available
  std::condition_variable cv_space;   // producer waits: ring has space
  std::deque<std::unique_ptr<Block>> ready;
  std::atomic<bool> stop{false};
  bool finished = false;

  ~Decoder() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_space.notify_all();
    if (worker.joinable()) worker.join();
    cap.release();
  }

  void decode_range(int64_t begin, int64_t end) {
    cap.set(cv::CAP_PROP_POS_FRAMES, static_cast<double>(begin));
    const size_t frame_bytes =
        static_cast<size_t>(display_w) * display_h * 3;
    int64_t next = begin;
    cv::Mat bgr, resized, rgb;
    while (!stop.load() && next < end) {
      auto block = std::make_unique<Block>();
      block->first_frame = next;
      block->data.resize(static_cast<size_t>(block_frames) * frame_bytes);
      int got = 0;
      while (got < block_frames && next < end) {
        if (!cap.read(bgr)) { next = end; break; }
        cv::Mat* src = &bgr;
        if (bgr.cols != display_w || bgr.rows != display_h) {
          cv::resize(bgr, resized, cv::Size(display_w, display_h));
          src = &resized;
        }
        cv::cvtColor(*src, rgb, cv::COLOR_BGR2RGB);
        std::memcpy(block->data.data() + got * frame_bytes, rgb.data,
                    frame_bytes);
        ++got;
        ++next;
      }
      block->n_frames = got;
      if (got == 0) break;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() || ready.size() < ring_blocks;
        });
        if (stop.load()) return;
        ready.push_back(std::move(block));
      }
      cv_ready.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      finished = true;
    }
    cv_ready.notify_all();
  }
};

}  // namespace

extern "C" {

void* frd_open(const char* path, int display_w, int display_h,
               int block_frames, int ring_blocks) {
  auto d = std::make_unique<Decoder>();
  if (!d->cap.open(path)) return nullptr;
  d->n_frames = static_cast<int64_t>(d->cap.get(cv::CAP_PROP_FRAME_COUNT));
  if (d->n_frames <= 0) return nullptr;
  d->storage_w = static_cast<int>(d->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  d->storage_h = static_cast<int>(d->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  d->fps = d->cap.get(cv::CAP_PROP_FPS);
  d->display_w = display_w > 0 ? display_w : d->storage_w;
  d->display_h = display_h > 0 ? display_h : d->storage_h;
  d->block_frames = block_frames;
  d->ring_blocks = static_cast<size_t>(ring_blocks > 0 ? ring_blocks : 2);
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
  d->worker = std::thread([d, begin, end] { d->decode_range(begin, end); });
}

int frd_next_block(void* handle, uint8_t* buf, int64_t* out_first_frame) {
  auto* d = static_cast<Decoder*>(handle);
  std::unique_ptr<Block> block;
  {
    std::unique_lock<std::mutex> lk(d->mu);
    d->cv_ready.wait(lk, [&] { return !d->ready.empty() || d->finished; });
    if (d->ready.empty()) return 0;
    block = std::move(d->ready.front());
    d->ready.pop_front();
  }
  d->cv_space.notify_one();
  const size_t frame_bytes =
      static_cast<size_t>(d->display_w) * d->display_h * 3;
  std::memcpy(buf, block->data.data(), block->n_frames * frame_bytes);
  *out_first_frame = block->first_frame;
  return block->n_frames;
}

void frd_close(void* handle) {
  delete static_cast<Decoder*>(handle);
}

}  // extern "C"
