// Fixed-size worker pool.
//
// Same role as the reference's ThreadPool (reference
// remote/optimizer/ThreadPool.h / .cpp:5-85) — which is compiled but whose
// only call site is commented out (OptimizerCpu.h:125-130).  Ours is live:
// the TCP server schedules per-connection sessions on it, and the native
// optimizer fans H/b assembly out over it with per-thread accumulators
// (no mutex in the hot loop, unlike OptimizerCpu.h:101-118).
#pragma once

#include <condition_variable>
#include <cstddef>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace toyslam {

class ThreadPool {
 public:
  explicit ThreadPool(size_t num_threads);
  ~ThreadPool();

  void submit(std::function<void()> task);
  // Block until every submitted task has finished.
  void wait_idle();
  size_t size() const { return workers_.size(); }

 private:
  void worker_loop();

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mutex_;
  std::condition_variable task_cv_;
  std::condition_variable idle_cv_;
  size_t in_flight_ = 0;
  bool stop_ = false;
};

}  // namespace toyslam
