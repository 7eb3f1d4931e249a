// C ABI surface consumed by toyslam_tpu/io/native.py via ctypes.
//
// The reference binds Python to C++ through a socket and a hand-rolled wire
// protocol only (reference python/remote/graph_client.py:13-52); here the
// native runtime is additionally linkable in-process, so the Python engine
// can use the native codec/server directly without a TCP hop.
#include <cstdlib>
#include <cstring>
#include <string>

#include "toyslam/codec.h"
#include "toyslam/graph.h"
#include "toyslam/optimizer.h"
#include "toyslam/server.h"
#include "toyslam/timer.h"

extern "C" {

void ts_set_verbose(int verbose) { toyslam::set_verbose(verbose != 0); }

// ---- codec -------------------------------------------------------------

TsGraph* ts_graph_decode(const uint8_t* data, uint64_t len, int framed) {
  if (framed) {
    if (len < 4) return nullptr;
    uint32_t body;
    std::memcpy(&body, data, 4);
    if (body != len - 4) return nullptr;
    data += 4;
    len -= 4;
  }
  return toyslam::decode_graph(data, len);
}

// Returns a malloc'd buffer (free with ts_buffer_free); *out_len set.
uint8_t* ts_graph_encode(const TsGraph* g, int framed, uint64_t* out_len) {
  std::vector<uint8_t> out;
  if (framed) out.resize(4);
  toyslam::encode_graph(*g, out);
  if (framed) {
    uint32_t body = static_cast<uint32_t>(out.size() - 4);
    std::memcpy(out.data(), &body, 4);
  }
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(out.size()));
  std::memcpy(buf, out.data(), out.size());
  *out_len = out.size();
  return buf;
}

void ts_buffer_free(uint8_t* buf) { std::free(buf); }

// ---- timing report -------------------------------------------------------

// Copies the phase-timing report ("caption:count:total_ms\n"...) into `dst`
// (truncating to dst_len - 1) and returns the untruncated length.
uint64_t ts_timing_report(char* dst, uint64_t dst_len, int clear) {
  std::string report = toyslam::timing_report(clear != 0);
  if (dst && dst_len > 0) {
    uint64_t n = report.size() < dst_len - 1 ? report.size() : dst_len - 1;
    std::memcpy(dst, report.data(), n);
    dst[n] = '\0';
  }
  return report.size();
}

// ---- server ----------------------------------------------------------------

void* ts_server_create(const char* host, uint16_t port, ts_optimize_cb cb,
                       void* user, int num_threads) {
  auto* server = new toyslam::Server(
      host ? host : "127.0.0.1", port, cb, user,
      num_threads > 0 ? static_cast<size_t>(num_threads) : 4);
  if (!server->initialize()) {
    delete server;
    return nullptr;
  }
  return server;
}

uint16_t ts_server_port(void* handle) {
  return static_cast<toyslam::Server*>(handle)->port();
}

void ts_server_run(void* handle) {
  static_cast<toyslam::Server*>(handle)->run();
}

void ts_server_stop(void* handle) {
  static_cast<toyslam::Server*>(handle)->stop();
}

void ts_server_free(void* handle) {
  delete static_cast<toyslam::Server*>(handle);
}

}  // extern "C"
