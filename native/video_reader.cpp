// Native threaded video decoder for AICamera-TPU.
//
// The reference decodes synchronously with Python cv2.VideoCapture.read()
// in its hot loop (reference src/aicamera_tracker.py:169-170). This is the
// tpu-native replacement: decode runs on C++ threads (no GIL) into a
// bounded in-order frame window, and the consumer drains whole chunks
// with ONE ctypes call per K frames (one Python crossing per device
// dispatch instead of K), overlapping host decode with device compute.
//
// Seekable files decode SEGMENT-PARALLEL: the frame range is pre-indexed
// into N contiguous segments, each decoded by its own worker (own
// VideoCapture, one keyframe seek per worker), merged in strict frame
// order through a shared reorder window with memory-bounded backpressure
// (a worker may run at most `window_cap` frames ahead of the consumer).
// Single-thread decode measured ~226 FPS on the 540p reference clip —
// below the 400 FPS/chip compute north star — so decode parallelism is
// what keeps a PCIe host's end-to-end min(decode, compute) above it.
// Webcams and streams without a frame count fall back to one worker.
//
// SCALING LIMIT (window vs segment length): worker k deposits frame i
// only when i < next_out + window_cap, and next_out advances at the rate
// of the slowest *preceding* segment — so each worker's usable lead is
// the window, and the parallel speedup over a file of n frames is
// bounded by roughly n / (n - (N-1)*min(window_cap, n/N)). Full N-way
// scaling therefore needs window_cap ≈ n_frames (every later segment
// buffered while segment 0 drains). When the caller does not pin
// `ring_frames`, parallel opens auto-size the window from a byte budget
// (AICAM_VR_WINDOW_BYTES, default 2 GiB) so files that fit decode at
// full parallelism; longer files degrade smoothly toward sequential
// speed and the budget bounds peak memory. Contiguous segments are kept
// on purpose: interleaved (strided) block scheduling would bound memory
// at full parallelism but costs one keyframe seek per block — on
// long-GOP content (keyint 250 is the x264 default) a seek decodes
// ~half a GOP it throws away, which can exceed the decode work it
// parallelizes. One seek per worker is robust to any GOP structure.
//
// C API (ctypes-friendly, see aicamera_tpu/native/__init__.py):
//   vr_open(path, webcam_id, ring_frames, max_frames, n_threads) ->
//       handle | NULL   (n_threads <= 1, webcam, or unknown frame count
//                        => single sequential decoder; ring_frames <= 0
//                        => auto window sizing as above)
//   vr_info(handle, &w, &h, &fps, &count)
//   vr_read(handle, dst, max) -> frames copied (blocks until max or EOF)
//   vr_close(handle)

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <atomic>
#include <climits>
#include <condition_variable>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr long long kNoGap = LLONG_MAX;
constexpr int kMinSegmentFrames = 48;  // don't spawn workers for scraps

struct NativeVideoReader {
  std::string path;
  cv::VideoCapture cap;  // probe handle; also the single-thread decoder
  int w = 0, h = 0;
  double fps = 0.0;
  long long count = 0;

  // In-order reorder window: slot i % window_cap holds frame i. A frame
  // may be written only when its index is < next_out + window_cap, which
  // also guarantees its slot has been drained (i - window_cap < next_out).
  int window_cap = 64;
  bool window_auto = true;  // caller did not pin ring_frames
  std::vector<cv::Mat> slots;
  std::vector<uint8_t> filled;  // bool per slot
  long long next_out = 0;       // next frame index the consumer pops
  long long total = -1;         // frames this reader will produce (-1 open)
  long long gap_at = kNoGap;    // earliest decode failure => stream end

  std::mutex mu;
  std::condition_variable cv_pop;   // consumer waits for frames/EOF
  std::condition_variable cv_push;  // workers wait for window space
  std::condition_variable cv_first; // boundary verification handshake
  std::atomic<bool> stop{false};
  int live_workers = 0;
  std::vector<std::thread> threads;

  // Boundary verification: CAP_PROP_POS_FRAMES round-trips are
  // tautological on the FFmpeg backend (get() echoes the seek target
  // even when the decoder landed elsewhere on VFR/open-GOP/broken-index
  // containers), so a "verified" seek proves nothing. Instead each
  // worker k>0 records a clone of its FIRST decoded frame, and worker
  // k-1 decodes ONE overlap frame past its segment end and compares
  // bytes BEFORE depositing its own last frame. On mismatch the stream
  // is truncated at the boundary (gap) — a correct prefix, never a
  // silently corrupted stream. Induction from worker 0 (sequential
  // from frame 0) makes every delivered frame seek-verified.
  enum { FIRST_PENDING = 0, FIRST_SET = 1, FIRST_FAILED = 2 };
  std::vector<cv::Mat> seg_first;
  std::vector<uint8_t> seg_first_state;

  bool fix_frame(cv::Mat& m) {
    if (m.type() != CV_8UC3) return false;  // unsupported pixel format
    if (m.cols != w || m.rows != h) {
      // defensive: mid-stream geometry change (corrupt containers)
      cv::Mat fixed;
      cv::resize(m, fixed, cv::Size(w, h));
      m = fixed;
    }
    if (!m.isContinuous()) m = m.clone();
    return true;
  }

  // Deposit frame `i`; returns false when shutting down.
  bool put(long long i, cv::Mat&& m) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] {
      return stop.load() || i < next_out + window_cap || i >= gap_at;
    });
    if (stop.load() || i >= gap_at) return false;
    slots[i % window_cap] = std::move(m);
    filled[i % window_cap] = 1;
    lk.unlock();
    cv_pop.notify_all();
    return true;
  }

  void mark_gap(long long i) {
    {
      std::lock_guard<std::mutex> lk(mu);
      if (i < gap_at) gap_at = i;
    }
    cv_pop.notify_all();
    cv_push.notify_all();  // workers past the gap stop waiting for space
    cv_first.notify_all();
  }

  void set_first(int seg_id, const cv::Mat* m) {
    {
      std::lock_guard<std::mutex> lk(mu);
      if (m) {
        seg_first[seg_id] = m->clone();
        seg_first_state[seg_id] = FIRST_SET;
      } else {
        seg_first_state[seg_id] = FIRST_FAILED;
      }
    }
    cv_first.notify_all();
  }

  static bool frames_equal(const cv::Mat& a, const cv::Mat& b) {
    if (a.empty() || b.empty() || a.size() != b.size() ||
        a.type() != b.type()) {
      return false;
    }
    const size_t bytes = a.total() * a.elemSize();
    return std::memcmp(a.data, b.data, bytes) == 0;
  }

  // Worker k's end-of-segment check: decode the overlap frame (index
  // `end`, the next segment's first) on `c` and compare with what the
  // next worker actually decoded after ITS seek. Truncates (gap) on
  // mismatch. Called BEFORE depositing frame end-1.
  void verify_boundary(cv::VideoCapture& c, int seg_id, long long end) {
    cv::Mat overlap;
    const bool ook = c.read(overlap) && !overlap.empty() &&
                     fix_frame(overlap);
    bool match = true;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_first.wait(lk, [&] {
        return stop.load() ||
               seg_first_state[seg_id + 1] != FIRST_PENDING;
      });
      if (stop.load()) return;
      if (seg_first_state[seg_id + 1] == FIRST_SET) {
        match = ook && frames_equal(overlap, seg_first[seg_id + 1]);
        seg_first[seg_id + 1].release();  // free the verification clone
      }
      // FIRST_FAILED: the next worker already marked its own gap
    }
    if (!match) mark_gap(end);
  }

  void worker_done() {
    {
      std::lock_guard<std::mutex> lk(mu);
      --live_workers;
    }
    cv_pop.notify_all();
  }

  // Sequential decode of [start, end) on an already-positioned capture.
  // Workers with a predecessor (seg_id > 0) publish their first decoded
  // frame for its boundary check; workers with a successor
  // (verify_end) run their own check before depositing the last frame.
  void decode_range(cv::VideoCapture& c, int seg_id, long long start,
                    long long end, bool verify_end) {
    for (long long i = start; i < end && !stop.load(); ++i) {
      cv::Mat m;
      if (!c.read(m) || m.empty() || !fix_frame(m)) {
        if (seg_id > 0 && i == start) set_first(seg_id, nullptr);
        mark_gap(i);
        break;
      }
      if (seg_id > 0 && i == start) set_first(seg_id, &m);
      if (verify_end && i == end - 1) verify_boundary(c, seg_id, end);
      if (!put(i, std::move(m))) break;
    }
    worker_done();
  }

  // Segment worker: own capture, one seek, then sequential.
  void decode_segment(int seg_id, long long start, long long end,
                      bool verify_end) {
    cv::VideoCapture c(path);
    bool ok = c.isOpened();
    if (ok && start > 0) {
      bool sought =
          c.set(cv::CAP_PROP_POS_FRAMES, static_cast<double>(start)) &&
          static_cast<long long>(c.get(cv::CAP_PROP_POS_FRAMES)) == start;
      if (!sought) {
        // container refuses the seek outright: decode-skip forward
        // (grab() decodes without the retrieve/convert cost) so the
        // stream is still delivered complete rather than truncated.
        // (A seek that LIES lands in verify_boundary instead.)
        c.release();
        ok = c.open(path);
        for (long long j = 0; ok && j < start && !stop.load(); ++j) {
          ok = c.grab();
        }
      }
    }
    if (!ok) {
      if (seg_id > 0) set_first(seg_id, nullptr);
      mark_gap(start);
      worker_done();
      return;
    }
    decode_range(c, seg_id, start, end, verify_end);
    c.release();
  }

  // Unbounded sequential decode (webcam / unknown count): frame indices
  // increment as decoded; EOF closes `total`.
  void decode_stream(long long limit) {
    long long i = 0;
    for (; (limit < 0 || i < limit) && !stop.load(); ++i) {
      cv::Mat m;
      if (!cap.read(m) || m.empty() || !fix_frame(m)) break;
      if (!put(i, std::move(m))) break;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      total = i;  // actual stream length now known
    }
    worker_done();
  }

  void start_workers(long long n_frames, int n_threads) {
    if (window_auto && n_threads > 1 && n_frames > 0) {
      // Auto-size the reorder window so segment workers can genuinely run
      // ahead of the consumer (see SCALING LIMIT in the file header):
      // window = min(n_frames, byte_budget / frame_bytes). Files that fit
      // the budget decode at full N-way parallelism; longer files get the
      // largest lead the budget allows.
      long long budget = 2LL << 30;  // 2 GiB default
      if (const char* env = std::getenv("AICAM_VR_WINDOW_BYTES")) {
        const long long v = std::atoll(env);
        if (v > 0) budget = v;
      }
      const long long frame_bytes =
          static_cast<long long>(w) * static_cast<long long>(h) * 3;
      const long long by_budget = std::max<long long>(
          budget / std::max<long long>(frame_bytes, 1), 1);
      long long wf = std::min<long long>(n_frames, by_budget);
      wf = std::min<long long>(wf, 1LL << 20);  // sanity cap on slot count
      window_cap = std::max(window_cap, static_cast<int>(wf));
    }
    window_cap = std::max(window_cap, 2 * n_threads);
    slots.resize(window_cap);
    filled.assign(window_cap, 0);
    if (n_frames < 0 || n_threads <= 1) {
      // sequential mode on the probe capture (already at frame 0)
      total = n_frames;  // -1 = open-ended
      live_workers = 1;
      threads.emplace_back(&NativeVideoReader::decode_stream, this,
                           n_frames);
      return;
    }
    total = n_frames;
    long long per = (n_frames + n_threads - 1) / n_threads;
    per = std::max<long long>(per, kMinSegmentFrames);
    cap.release();  // workers open their own captures
    std::vector<std::pair<long long, long long>> segs;
    for (long long start = 0; start < n_frames;) {
      long long end = std::min(start + per, n_frames);
      segs.emplace_back(start, end);
      start = end;
    }
    seg_first.resize(segs.size());
    seg_first_state.assign(segs.size(), FIRST_PENDING);
    {
      // Published BEFORE any worker can run: workers decrement under the
      // same mutex in worker_done(), so incrementing per spawn iteration
      // would race an early-exiting worker (capture-open failure path)
      // and could leave the count permanently wrong.
      std::lock_guard<std::mutex> lk(mu);
      live_workers = static_cast<int>(segs.size());
    }
    for (size_t sid = 0; sid < segs.size(); ++sid) {
      threads.emplace_back(&NativeVideoReader::decode_segment, this,
                           static_cast<int>(sid), segs[sid].first,
                           segs[sid].second, sid + 1 < segs.size());
    }
  }
};

}  // namespace

extern "C" {

void* vr_open(const char* path, int webcam_id, int ring_frames,
              long long max_frames, int n_threads) {
  auto* r = new NativeVideoReader();
  const bool is_webcam = webcam_id >= 0;
  const bool ok = is_webcam ? r->cap.open(webcam_id) : r->cap.open(path);
  if (!ok || !r->cap.isOpened()) {
    delete r;
    return nullptr;
  }
  r->path = path ? path : "";
  r->w = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  r->h = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  r->fps = r->cap.get(cv::CAP_PROP_FPS);
  r->count = static_cast<long long>(r->cap.get(cv::CAP_PROP_FRAME_COUNT));
  if (r->w <= 0 || r->h <= 0) {
    delete r;
    return nullptr;
  }
  if (ring_frames > 0) {
    r->window_cap = ring_frames;
    r->window_auto = false;  // caller pinned the window: hard memory cap
  }

  // Parallel segment decode needs a trustworthy frame count and a
  // seekable source; otherwise fall back to one sequential worker.
  long long n_frames = -1;
  if (!is_webcam && r->count > 0) {
    n_frames = (max_frames >= 0) ? std::min(max_frames, r->count)
                                 : r->count;
  } else if (max_frames >= 0) {
    n_frames = max_frames;  // bounded but count unknown: sequential
    n_threads = 1;
  }
  if (is_webcam || n_frames < 0) n_threads = 1;
  if (n_threads < 1) n_threads = 1;
  if (n_frames > 0) {
    const long long max_useful =
        (n_frames + kMinSegmentFrames - 1) / kMinSegmentFrames;
    n_threads = static_cast<int>(
        std::min<long long>(n_threads, std::max<long long>(max_useful, 1)));
  }
  r->start_workers(n_frames, n_threads);
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

// Copy up to `max` decoded frames into dst (contiguous h*w*3 u8 each),
// strictly in source order. Blocks until `max` frames have been copied or
// the stream ends, draining the window incrementally (workers refill
// while the consumer copies, and `max` larger than the window capacity
// cannot deadlock); returns the number copied (0 = EOF, -1 = error). A
// partial return (< max, > 0) therefore only happens at end of stream.
int vr_read(void* handle, unsigned char* dst, int max) {
  auto* r = static_cast<NativeVideoReader*>(handle);
  if (!r || max <= 0 || !dst) return -1;
  const size_t frame_bytes =
      static_cast<size_t>(r->w) * static_cast<size_t>(r->h) * 3u;
  int got = 0;
  std::unique_lock<std::mutex> lk(r->mu);
  while (got < max) {
    r->cv_pop.wait(lk, [&] {
      return r->stop.load() || r->filled[r->next_out % r->window_cap] ||
             r->next_out >= r->gap_at ||
             (r->total >= 0 && r->next_out >= r->total) ||
             r->live_workers == 0;
    });
    if (r->stop.load()) break;
    // drain every in-order frame currently available
    while (got < max && r->next_out < r->gap_at &&
           (r->total < 0 || r->next_out < r->total) &&
           r->filled[r->next_out % r->window_cap]) {
      const long long idx = r->next_out % r->window_cap;
      cv::Mat m = std::move(r->slots[idx]);
      r->filled[idx] = 0;
      ++r->next_out;
      r->cv_push.notify_all();
      lk.unlock();
      std::memcpy(dst + static_cast<size_t>(got) * frame_bytes, m.data,
                  frame_bytes);
      ++got;
      lk.lock();
    }
    if (got >= max) break;
    const bool ended =
        r->next_out >= r->gap_at ||
        (r->total >= 0 && r->next_out >= r->total) ||
        (r->live_workers == 0 &&
         !r->filled[r->next_out % r->window_cap]);
    if (ended) break;
  }
  return got;
}

void vr_close(void* handle) {
  auto* r = static_cast<NativeVideoReader*>(handle);
  if (!r) return;
  r->stop.store(true);
  r->cv_push.notify_all();
  r->cv_pop.notify_all();
  r->cv_first.notify_all();
  for (auto& t : r->threads) {
    if (t.joinable()) t.join();
  }
  r->cap.release();
  delete r;
}

}  // extern "C"
