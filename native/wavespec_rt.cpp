// wavespec_rt: native runtime for the wavespec_tpu framework.
//
// Rebuilds the host-side native responsibilities of the reference's closed
// mt-bridge.dll that are NOT device compute (device compute is JAX/XLA):
//
//  * status/error-channel discipline: every entry point returns the
//    ALGLIB_STATUS_* codes used by the reference
//    (WaveCyclesBatchFetcher.mq5:14-22) and a per-thread last-error string
//    is readable via ws_get_last_error (gpu_get_last_error_w parity,
//    Include/imports.mqh:20);
//  * binary cache IO in the exact reference formats:
//      - feed cache  (Include/FeedCache.mqh:30-115):
//            int32 count, count x float64 (newest-first)
//      - cycle cache (WaveSpecZZ_1.1.0-gpuopt.mq5:224-324):
//            int32 version=1, int32 bars, int32 topk=2,
//            bars x 20 float64 (2 waves x 10 fields interleaved)
//  * an async job table with a worker thread pool: ws_submit_job /
//    ws_try_get_job / ws_free_job mirror gpu_submit_* / gpu_try_get_* /
//    gpu_free_job (Include/imports.mqh:12-18); jobs run caller-provided
//    callbacks (the Python layer passes host-side work: staging, decode,
//    file IO) so the hot device path never blocks on the host.
//
// Build: g++ -std=c++17 -O2 -shared -fPIC -o _wavespec_rt.so wavespec_rt.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

// Status codes (reference: WaveCyclesBatchFetcher.mq5:14-22)
enum WsStatus : int32_t {
  WS_OK = 0,
  WS_BAD_ARGS = -1,
  WS_BACKEND_UNAVAILABLE = -2,
  WS_TIMEOUT = -3,
  WS_INTERNAL_ERROR = -4,
  WS_NOT_READY = -5,
  WS_NO_MEM = -6,
};

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

}  // namespace

extern "C" {

// ----------------------------------------------------------------- errors

int32_t ws_get_last_error(char* buf, int32_t cap) {
  if (!buf || cap <= 0) return WS_BAD_ARGS;
  std::snprintf(buf, static_cast<size_t>(cap), "%s", g_last_error.c_str());
  return WS_OK;
}

// ------------------------------------------------------------- feed cache

int32_t ws_feed_cache_count(const char* path, int32_t* count_out) {
  if (!path || !count_out) return WS_BAD_ARGS;
  FILE* f = std::fopen(path, "rb");
  if (!f) { set_error("feed cache open failed"); return WS_BACKEND_UNAVAILABLE; }
  int32_t count = 0;
  size_t got = std::fread(&count, sizeof(count), 1, f);
  std::fclose(f);
  if (got != 1 || count < 0) { set_error("feed cache header"); return WS_INTERNAL_ERROR; }
  *count_out = count;
  return WS_OK;
}

int32_t ws_feed_cache_load(const char* path, double* out, int32_t cap,
                           int32_t* count_out) {
  if (!path || !out || !count_out || cap < 0) return WS_BAD_ARGS;
  FILE* f = std::fopen(path, "rb");
  if (!f) { set_error("feed cache open failed"); return WS_BACKEND_UNAVAILABLE; }
  int32_t count = 0;
  if (std::fread(&count, sizeof(count), 1, f) != 1 || count < 0) {
    std::fclose(f);
    set_error("feed cache header");
    return WS_INTERNAL_ERROR;
  }
  int32_t n = count < cap ? count : cap;
  size_t got = std::fread(out, sizeof(double), static_cast<size_t>(n), f);
  std::fclose(f);
  if (static_cast<int32_t>(got) != n) { set_error("feed cache truncated"); return WS_INTERNAL_ERROR; }
  *count_out = n;
  return WS_OK;
}

int32_t ws_feed_cache_save(const char* path, const double* data, int32_t count) {
  if (!path || (!data && count > 0) || count < 0) return WS_BAD_ARGS;
  FILE* f = std::fopen(path, "wb");
  if (!f) { set_error("feed cache create failed"); return WS_BACKEND_UNAVAILABLE; }
  bool ok = std::fwrite(&count, sizeof(count), 1, f) == 1 &&
            std::fwrite(data, sizeof(double), static_cast<size_t>(count), f) ==
                static_cast<size_t>(count);
  std::fclose(f);
  if (!ok) { set_error("feed cache write failed"); return WS_INTERNAL_ERROR; }
  return WS_OK;
}

// ------------------------------------------------------------ cycle cache

static constexpr int32_t kCycleFields = 20;  // 2 waves x 10 fields
static constexpr int32_t kCycleVersion = 1;

int32_t ws_cycle_cache_load(const char* path, double* out, int32_t cap_bars,
                            int32_t* bars_out, int32_t* topk_out) {
  if (!path || !out || !bars_out || !topk_out) return WS_BAD_ARGS;
  FILE* f = std::fopen(path, "rb");
  if (!f) { set_error("cycle cache open failed"); return WS_BACKEND_UNAVAILABLE; }
  int32_t version = 0, bars = 0, topk = 0;
  bool hdr = std::fread(&version, 4, 1, f) == 1 && std::fread(&bars, 4, 1, f) == 1 &&
             std::fread(&topk, 4, 1, f) == 1;
  if (!hdr || version != kCycleVersion || topk < 1 || topk > 2 || bars < 0) {
    std::fclose(f);
    set_error("cycle cache header/version");
    return WS_INTERNAL_ERROR;
  }
  int32_t n = bars < cap_bars ? bars : cap_bars;
  size_t want = static_cast<size_t>(n) * kCycleFields;
  size_t got = std::fread(out, sizeof(double), want, f);
  std::fclose(f);
  if (got != want) { set_error("cycle cache truncated"); return WS_INTERNAL_ERROR; }
  *bars_out = n;
  *topk_out = topk;
  return WS_OK;
}

int32_t ws_cycle_cache_save(const char* path, const double* data, int32_t bars) {
  if (!path || (!data && bars > 0) || bars < 0) return WS_BAD_ARGS;
  FILE* f = std::fopen(path, "wb");
  if (!f) { set_error("cycle cache create failed"); return WS_BACKEND_UNAVAILABLE; }
  int32_t version = kCycleVersion, topk = 2;
  bool ok = std::fwrite(&version, 4, 1, f) == 1 && std::fwrite(&bars, 4, 1, f) == 1 &&
            std::fwrite(&topk, 4, 1, f) == 1 &&
            std::fwrite(data, sizeof(double),
                        static_cast<size_t>(bars) * kCycleFields, f) ==
                static_cast<size_t>(bars) * kCycleFields;
  std::fclose(f);
  if (!ok) { set_error("cycle cache write failed"); return WS_INTERNAL_ERROR; }
  return WS_OK;
}

// ---------------------------------------------------------- async job pool

typedef void (*ws_job_fn)(void* user_data);

namespace {

struct Job {
  ws_job_fn fn = nullptr;
  void* user = nullptr;
  std::atomic<bool> done{false};
};

class JobPool {
 public:
  int32_t init(int32_t workers) {
    std::lock_guard<std::mutex> lk(mu_);
    if (running_) return WS_OK;  // idempotent like repeated gpu_init
    if (workers < 1) workers = 1;
    if (workers > 512) workers = 512;  // stream clamp (1.1.0:729)
    running_ = true;
    for (int32_t i = 0; i < workers; ++i) {
      threads_.emplace_back([this] { worker(); });
    }
    return WS_OK;
  }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (!running_) return;
      running_ = false;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
    threads_.clear();
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (auto& kv : jobs_) delete kv.second;
      jobs_.clear();
      queue_.clear();
    }
    // wake free_job waiters so they observe the reaped map / !running_
    done_cv_.notify_all();
  }

  int32_t submit(ws_job_fn fn, void* user, int32_t* id_out) {
    if (!fn || !id_out) return WS_BAD_ARGS;
    std::lock_guard<std::mutex> lk(mu_);
    if (!running_) { set_error("pool not initialized"); return WS_BACKEND_UNAVAILABLE; }
    int32_t id = next_id_++;
    Job* job = new (std::nothrow) Job{};
    if (!job) return WS_NO_MEM;
    job->fn = fn;
    job->user = user;
    jobs_[id] = job;
    queue_.push_back(id);
    cv_.notify_one();
    *id_out = id;
    return WS_OK;
  }

  int32_t try_get(int32_t id, int32_t* ready_out) {
    if (!ready_out) return WS_BAD_ARGS;
    std::lock_guard<std::mutex> lk(mu_);
    auto it = jobs_.find(id);
    if (it == jobs_.end()) { set_error("unknown job id"); return WS_BAD_ARGS; }
    *ready_out = it->second->done.load() ? 1 : 0;
    return *ready_out ? WS_OK : WS_NOT_READY;
  }

  int32_t free_job(int32_t id) {
    // Blocks until the job has executed so we never free a running
    // job's state. The wait is on a condition variable (not a spin),
    // and the map is re-looked-up by id after EVERY wakeup: while mu_
    // is released inside wait(), a concurrent submit() may rehash the
    // map (invalidating iterators) or shutdown() may delete the Job —
    // a pre-wait iterator/pointer must never be reused.
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      auto it = jobs_.find(id);
      if (it == jobs_.end()) return WS_BAD_ARGS;  // unknown or reaped
      Job* job = it->second;
      if (job->done.load()) {
        jobs_.erase(it);
        delete job;
        return WS_OK;
      }
      // Not done yet: wait. Even during shutdown the workers DRAIN the
      // queue before exiting (a popped job may be mid-execution right
      // now), so completion — or shutdown's final reap, which makes the
      // lookup above fail — is guaranteed to wake us.
      done_cv_.wait(lk);
    }
  }

  int32_t pending() {
    std::lock_guard<std::mutex> lk(mu_);
    int32_t n = 0;
    for (auto& kv : jobs_)
      if (!kv.second->done.load()) ++n;
    return n;
  }

 private:
  void worker() {
    for (;;) {
      int32_t id;
      Job* job = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return !running_ || !queue_.empty(); });
        if (!running_ && queue_.empty()) return;
        id = queue_.front();
        queue_.pop_front();
        auto it = jobs_.find(id);
        if (it == jobs_.end()) continue;
        job = it->second;
      }
      job->fn(job->user);
      job->done.store(true);
      // Acquire/release mu_ before notifying so a free_job waiter that
      // checked done==false cannot miss the wakeup (it holds mu_ until
      // it is inside wait()).
      { std::lock_guard<std::mutex> lk(mu_); }
      done_cv_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;       // queue wakeups (workers)
  std::condition_variable done_cv_;  // per-job completion (free_job waiters)
  std::vector<std::thread> threads_;
  std::deque<int32_t> queue_;
  std::unordered_map<int32_t, Job*> jobs_;
  int32_t next_id_ = 1;
  bool running_ = false;
};

JobPool g_pool;

}  // namespace

int32_t ws_init(int32_t workers) { return g_pool.init(workers); }
void ws_shutdown(void) { g_pool.shutdown(); }
int32_t ws_submit_job(ws_job_fn fn, void* user, int32_t* id_out) {
  return g_pool.submit(fn, user, id_out);
}
int32_t ws_try_get_job(int32_t id, int32_t* ready_out) {
  return g_pool.try_get(id, ready_out);
}
int32_t ws_free_job(int32_t id) { return g_pool.free_job(id); }
int32_t ws_pending_jobs(void) { return g_pool.pending(); }

}  // extern "C"
