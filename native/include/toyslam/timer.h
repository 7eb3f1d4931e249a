// RAII scoped phase timer — the native observability primitive.
//
// Equivalent in role to the reference's BlockTimer (reference
// remote/tools/BlockTimer.h:7-19, BlockTimer.cpp:6-19: prints
// "[caption] time: Xms" at scope exit with a per-thread indent level), with
// two additions the reference lacks: timings are also recorded into a
// queryable registry (so servers can report phase breakdowns instead of only
// printing), and printing is opt-in via ts_set_verbose.
#pragma once

#include <chrono>
#include <cstdint>
#include <string>

namespace toyslam {

void set_verbose(bool verbose);
bool verbose();

// Thread-safe cumulative (count, total_ns) per caption.
void record_timing(const std::string& caption, int64_t ns);
// Snapshot "caption:count:total_ms" lines, '\n'-joined. Clears if requested.
std::string timing_report(bool clear);

class ScopedTimer {
 public:
  explicit ScopedTimer(std::string caption);
  ~ScopedTimer();
  ScopedTimer(const ScopedTimer&) = delete;
  ScopedTimer& operator=(const ScopedTimer&) = delete;

 private:
  std::string caption_;
  std::chrono::steady_clock::time_point start_;
  int level_;
};

}  // namespace toyslam
