#include "toyslam/timer.h"

#include <atomic>
#include <cstdio>
#include <map>
#include <mutex>
#include <sstream>

namespace toyslam {
namespace {

std::atomic<bool> g_verbose{false};
thread_local int t_level = 0;

std::mutex g_mutex;
std::map<std::string, std::pair<int64_t, int64_t>> g_timings;  // count, ns

}  // namespace

void set_verbose(bool verbose) { g_verbose.store(verbose); }
bool verbose() { return g_verbose.load(); }

void record_timing(const std::string& caption, int64_t ns) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto& entry = g_timings[caption];
  entry.first += 1;
  entry.second += ns;
}

std::string timing_report(bool clear) {
  std::lock_guard<std::mutex> lock(g_mutex);
  std::ostringstream out;
  for (const auto& kv : g_timings) {
    out << kv.first << ":" << kv.second.first << ":"
        << (static_cast<double>(kv.second.second) / 1e6) << "\n";
  }
  if (clear) g_timings.clear();
  return out.str();
}

ScopedTimer::ScopedTimer(std::string caption)
    : caption_(std::move(caption)),
      start_(std::chrono::steady_clock::now()),
      level_(t_level++) {}

ScopedTimer::~ScopedTimer() {
  --t_level;
  const auto ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
                      std::chrono::steady_clock::now() - start_)
                      .count();
  record_timing(caption_, ns);
  if (g_verbose.load()) {
    std::string indent(static_cast<size_t>(level_) * 2, ' ');
    std::fprintf(stderr, "%s[%s] time: %.3fms\n", indent.c_str(),
                 caption_.c_str(), static_cast<double>(ns) / 1e6);
  }
}

}  // namespace toyslam
