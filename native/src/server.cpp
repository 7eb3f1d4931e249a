#include "toyslam/server.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstring>
#include <vector>

#include "toyslam/codec.h"
#include "toyslam/optimizer.h"
#include "toyslam/timer.h"

namespace toyslam {
namespace {

// read exactly n bytes; false on EOF/error (the reference's
// transfer_exactly semantics, ConnectionHandlerBase.h:45-64)
bool read_exact(int fd, uint8_t* dst, uint64_t n) {
  uint64_t got = 0;
  while (got < n) {
    ssize_t r = ::recv(fd, dst + got, n - got, 0);
    if (r <= 0) return false;
    got += static_cast<uint64_t>(r);
  }
  return true;
}

bool write_all(int fd, const uint8_t* src, uint64_t n) {
  uint64_t sent = 0;
  while (sent < n) {
    ssize_t w = ::send(fd, src + sent, n - sent, MSG_NOSIGNAL);
    if (w <= 0) return false;
    sent += static_cast<uint64_t>(w);
  }
  return true;
}

}  // namespace

Server::Server(std::string host, uint16_t port, ts_optimize_cb cb, void* user,
               size_t num_threads)
    : host_(std::move(host)),
      port_(port),
      cb_(cb),
      user_(user),
      pool_(num_threads) {}

Server::~Server() {
  stop();
  if (listen_fd_ >= 0) ::close(listen_fd_);
}

bool Server::initialize() {
  listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
  if (listen_fd_ < 0) return false;
  int one = 1;
  ::setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));

  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port_);
  if (::inet_pton(AF_INET, host_.c_str(), &addr.sin_addr) != 1) {
    addr.sin_addr.s_addr = INADDR_ANY;
  }
  if (::bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) <
      0) {
    return false;
  }
  if (::listen(listen_fd_, 16) < 0) return false;

  socklen_t len = sizeof(addr);
  if (::getsockname(listen_fd_, reinterpret_cast<sockaddr*>(&addr), &len) ==
      0) {
    port_ = ntohs(addr.sin_port);
  }
  if (verbose()) std::fprintf(stderr, "[server] listening on %u\n", port_);
  return true;
}

void Server::run() {
  while (!stopping_.load()) {
    int fd = ::accept(listen_fd_, nullptr, nullptr);
    if (fd < 0) {
      if (stopping_.load()) break;
      continue;  // transient accept error; keep the loop alive
    }
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    pool_.submit([this, fd] { handle_session(fd); });
  }
}

void Server::stop() {
  if (stopping_.exchange(true)) return;
  if (listen_fd_ >= 0) ::shutdown(listen_fd_, SHUT_RDWR);
  pool_.wait_idle();
}

void Server::handle_session(int fd) {
  std::vector<uint8_t> body;
  for (;;) {
    uint8_t head[4];
    if (!read_exact(fd, head, 4)) break;  // client closed
    uint32_t size;
    std::memcpy(&size, head, 4);
    if (size == 0 || size > (1u << 30)) break;  // malformed frame
    body.resize(size);
    if (!read_exact(fd, body.data(), size)) break;

    ScopedTimer t_total("Total");
    TsGraph* g;
    {
      ScopedTimer t("Deserialize");
      g = decode_graph(body.data(), body.size());
    }
    if (!g) break;

    int rc;
    if (cb_) {
      rc = cb_(g, user_);
    } else {
      TsOptimizeStats stats;
      rc = ts_optimize(g, nullptr, &stats);
    }
    if (rc != 0) {
      ts_graph_free(g);
      break;
    }

    std::vector<uint8_t> reply(4);
    {
      ScopedTimer t("Serialize");
      encode_graph(*g, reply);
      uint32_t rsize = static_cast<uint32_t>(reply.size() - 4);
      std::memcpy(reply.data(), &rsize, 4);
    }
    ts_graph_free(g);
    {
      ScopedTimer t("Sending");
      if (!write_all(fd, reply.data(), reply.size())) break;
    }
  }
  ::close(fd);
}

}  // namespace toyslam
