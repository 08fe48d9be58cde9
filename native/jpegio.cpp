// Native JPEG writer with an async worker pool.
//
// Replaces the reference's per-face PIL JPEG saves
// (/root/reference/facerec/extract.py:126,185) with libjpeg encoding on
// a background thread queue so image IO never blocks the device feed.
//
// C ABI:
//   fjw_open(n_threads, quality)
//   fjw_submit(handle, path, data, w, h, channels)  // data copied; 1=gray 3=RGB
//   fjw_pending(handle)
//   fjw_close(handle)   // drains queue
//
// Build: make -C native   (g++ + libjpeg)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct Job {
  std::string path;
  std::vector<uint8_t> data;
  int w, h, channels;
};

struct Writer {
  int quality;
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Job> jobs;
  std::atomic<int> pending{0};
  bool stopping = false;

  void encode(const Job& job) {
    FILE* f = std::fopen(job.path.c_str(), "wb");
    if (!f) return;
    jpeg_compress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, f);
    cinfo.image_width = job.w;
    cinfo.image_height = job.h;
    cinfo.input_components = job.channels;
    cinfo.in_color_space = job.channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    const int stride = job.w * job.channels;
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = const_cast<uint8_t*>(
          job.data.data() + cinfo.next_scanline * stride);
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    std::fclose(f);
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stopping || !jobs.empty(); });
        if (jobs.empty()) return;  // stopping and drained
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      encode(job);
      pending.fetch_sub(1);
    }
  }
};

}  // namespace

extern "C" {

void* fjw_open(int n_threads, int quality) {
  auto* w = new Writer();
  w->quality = quality;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i)
    w->threads.emplace_back([w] { w->run(); });
  return w;
}

void fjw_submit(void* handle, const char* path, const uint8_t* data,
                int width, int height, int channels) {
  auto* w = static_cast<Writer*>(handle);
  Job job;
  job.path = path;
  job.w = width;
  job.h = height;
  job.channels = channels;
  job.data.assign(data,
                  data + static_cast<size_t>(width) * height * channels);
  w->pending.fetch_add(1);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->jobs.push_back(std::move(job));
  }
  w->cv.notify_one();
}

int fjw_pending(void* handle) {
  return static_cast<Writer*>(handle)->pending.load();
}

void fjw_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->stopping = true;
  }
  w->cv.notify_all();
  for (auto& t : w->threads) t.join();
  delete w;
}

}  // extern "C"
