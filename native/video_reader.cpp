// Native threaded video decoder for AICamera-TPU.
//
// The reference decodes synchronously with Python cv2.VideoCapture.read()
// in its hot loop (reference src/aicamera_tracker.py:169-170). This is the
// tpu-native replacement: decode runs on a dedicated C++ thread (no GIL)
// into a bounded ring of BGR frames, and the consumer drains whole chunks
// with ONE ctypes call per K frames (one Python crossing per device
// dispatch instead of K), overlapping host decode with device compute.
//
// C API (ctypes-friendly, see aicamera_tpu/native/__init__.py):
//   vr_open(path, webcam_id, ring_frames, max_frames) -> handle | NULL
//   vr_info(handle, &w, &h, &fps, &count)
//   vr_read(handle, dst, max) -> frames copied (blocks until max or EOF)
//   vr_close(handle)

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>

namespace {

struct NativeVideoReader {
  cv::VideoCapture cap;
  int w = 0, h = 0;
  double fps = 0.0;
  long long count = 0;

  int ring_cap = 64;
  long long max_frames = -1;  // -1 = unlimited
  std::deque<cv::Mat> ring;
  std::mutex mu;
  std::condition_variable cv_pop;   // consumer waits for frames/EOF
  std::condition_variable cv_push;  // decoder waits for ring space
  std::atomic<bool> stop{false};
  bool eof = false;
  std::thread th;

  void decode_loop() {
    long long n = 0;
    for (;;) {
      if (stop.load() || (max_frames >= 0 && n >= max_frames)) break;
      cv::Mat m;
      if (!cap.read(m) || m.empty()) break;
      if (m.type() != CV_8UC3) break;  // unsupported pixel format
      if (m.cols != w || m.rows != h) {
        // defensive: mid-stream geometry change (corrupt containers)
        cv::Mat fixed;
        cv::resize(m, fixed, cv::Size(w, h));
        m = fixed;
      }
      if (!m.isContinuous()) m = m.clone();
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] {
          return stop.load() || static_cast<int>(ring.size()) < ring_cap;
        });
        if (stop.load()) break;
        ring.push_back(std::move(m));
      }
      cv_pop.notify_one();
      ++n;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      eof = true;
    }
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* vr_open(const char* path, int webcam_id, int ring_frames,
              long long max_frames) {
  auto* r = new NativeVideoReader();
  const bool ok = (webcam_id >= 0) ? r->cap.open(webcam_id)
                                   : r->cap.open(path);
  if (!ok || !r->cap.isOpened()) {
    delete r;
    return nullptr;
  }
  r->w = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  r->h = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  r->fps = r->cap.get(cv::CAP_PROP_FPS);
  r->count = static_cast<long long>(r->cap.get(cv::CAP_PROP_FRAME_COUNT));
  if (r->w <= 0 || r->h <= 0) {
    delete r;
    return nullptr;
  }
  if (ring_frames > 0) r->ring_cap = ring_frames;
  r->max_frames = max_frames;
  r->th = std::thread(&NativeVideoReader::decode_loop, r);
  return r;
}

int vr_info(void* handle, int* w, int* h, double* fps, long long* count) {
  auto* r = static_cast<NativeVideoReader*>(handle);
  if (!r) return -1;
  *w = r->w;
  *h = r->h;
  *fps = r->fps;
  *count = r->count;
  return 0;
}

// Copy up to `max` decoded frames into dst (contiguous h*w*3 u8 each).
// Blocks until `max` frames have been copied or the stream ends, draining
// the ring incrementally (so the decoder refills while the consumer
// copies, and `max` larger than the ring capacity cannot deadlock);
// returns the number copied (0 = EOF, -1 = error). A partial return
// (< max, > 0) therefore only happens at end of stream.
int vr_read(void* handle, unsigned char* dst, int max) {
  auto* r = static_cast<NativeVideoReader*>(handle);
  if (!r || max <= 0 || !dst) return -1;
  const size_t frame_bytes =
      static_cast<size_t>(r->w) * static_cast<size_t>(r->h) * 3u;
  int got = 0;
  std::unique_lock<std::mutex> lk(r->mu);
  while (got < max) {
    r->cv_pop.wait(lk, [&] { return !r->ring.empty() || r->eof; });
    if (r->ring.empty()) break;  // eof and fully drained
    while (got < max && !r->ring.empty()) {
      cv::Mat m = std::move(r->ring.front());
      r->ring.pop_front();
      r->cv_push.notify_one();
      lk.unlock();
      std::memcpy(dst + static_cast<size_t>(got) * frame_bytes, m.data,
                  frame_bytes);
      ++got;
      lk.lock();
    }
  }
  return got;
}

void vr_close(void* handle) {
  auto* r = static_cast<NativeVideoReader*>(handle);
  if (!r) return;
  r->stop.store(true);
  r->cv_push.notify_all();
  r->cv_pop.notify_all();
  if (r->th.joinable()) r->th.join();
  r->cap.release();
  delete r;
}

}  // extern "C"
