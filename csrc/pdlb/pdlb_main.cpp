// sgl-tpu-pdlb: prefill/decode disaggregation load balancer.
//
// C++ re-creation of the reference's Rust sgl-pdlb
// (sgl-pdlb/src/strategy_lb.rs: EngineInfo + StrategyLB with Random and
// PowerOfTwo pair selection, per-pair bootstrap-room assignment;
// server.rs actix proxy): each generate request is assigned a
// (prefill, decode) server pair and a random bootstrap room id; the
// request is POSTed to both (prefill carries the KV-producer role), and
// the decode server's streamed response is returned to the client.

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <mutex>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "../router/http.h"

using namespace sgl_tpu_http;

struct EngineInfo {
  std::string host;
  int port;
  std::atomic<int64_t> active{0};
  EngineInfo(std::string h, int p) : host(std::move(h)), port(p) {}
};

struct PDLB {
  std::vector<std::unique_ptr<EngineInfo>> prefill;
  std::vector<std::unique_ptr<EngineInfo>> decode;
  std::string policy = "power_of_two";
  std::mt19937_64 rng{0xC0FFEE};
  std::mutex mu;
  std::atomic<int64_t> requests{0};

  EngineInfo* PickFrom(std::vector<std::unique_ptr<EngineInfo>>& v) {
    if (v.empty()) return nullptr;
    std::lock_guard<std::mutex> lk(mu);
    if (policy == "random" || v.size() == 1) {
      return v[rng() % v.size()].get();
    }
    // power-of-two-choices: sample two, take the less loaded
    EngineInfo* a = v[rng() % v.size()].get();
    EngineInfo* b = v[rng() % v.size()].get();
    return a->active <= b->active ? a : b;
  }

  uint64_t NewRoom() {
    std::lock_guard<std::mutex> lk(mu);
    return rng();
  }
};

static PDLB g_lb;

// Inject bootstrap fields into the JSON body (before the final '}').
static std::string WithBootstrap(const std::string& body,
                                 const std::string& host, int port,
                                 uint64_t room) {
  auto end = body.rfind('}');
  if (end == std::string::npos) return body;
  std::ostringstream extra;
  extra << ",\"bootstrap_host\":\"" << host << "\",\"bootstrap_port\":" << port
        << ",\"bootstrap_room\":" << room << "}";
  return body.substr(0, end) + extra.str();
}

static void HandleConn(int fd) {
  Request req;
  if (!ReadRequest(fd, &req)) {
    close(fd);
    return;
  }
  g_lb.requests++;
  if (req.path == "/health") {
    Respond(fd, 200, "{\"status\":\"ok\"}");
  } else if (req.path == "/metrics") {
    std::ostringstream out;
    out << "sgl_pdlb_requests_total " << g_lb.requests << "\n";
    Respond(fd, 200, out.str(), "text/plain");
  } else {
    EngineInfo* p = g_lb.PickFrom(g_lb.prefill);
    EngineInfo* d = g_lb.PickFrom(g_lb.decode);
    if (!p || !d) {
      Respond(fd, 503, "{\"error\":\"no prefill/decode servers\"}");
      close(fd);
      return;
    }
    uint64_t room = g_lb.NewRoom();
    Request preq = req;
    preq.body = WithBootstrap(req.body, p->host, p->port + 1000, room);
    Request dreq = req;
    dreq.body = WithBootstrap(req.body, p->host, p->port + 1000, room);
    p->active++;
    d->active++;
    // fire prefill asynchronously; stream the decode response to client
    std::thread([preq, p]() {
      int up = Connect(p->host, p->port);
      if (up >= 0) {
        std::ostringstream out;
        out << preq.method << " " << preq.path << " HTTP/1.1\r\n"
            << "host: x\r\ncontent-type: application/json\r\n"
            << "connection: close\r\ncontent-length: " << preq.body.size()
            << "\r\n\r\n"
            << preq.body;
        WriteAll(up, out.str());
        char buf[4096];
        while (read(up, buf, sizeof(buf)) > 0) {
        }
        close(up);
      }
      p->active--;
    }).detach();
    ProxyRequest(dreq, d->host, d->port, fd);
    d->active--;
  }
  close(fd);
}

int main(int argc, char** argv) {
  int port = 30090;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto parse = [&](std::vector<std::unique_ptr<EngineInfo>>& v) {
      std::string url = argv[++i];
      auto colon = url.rfind(':');
      v.emplace_back(new EngineInfo(url.substr(0, colon),
                                    atoi(url.c_str() + colon + 1)));
    };
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--policy" && i + 1 < argc) g_lb.policy = argv[++i];
    else if (a == "--prefill" && i + 1 < argc) parse(g_lb.prefill);
    else if (a == "--decode" && i + 1 < argc) parse(g_lb.decode);
  }
  int lfd = Listen(port);
  if (lfd < 0) {
    fprintf(stderr, "pdlb: failed to listen on %d\n", port);
    return 1;
  }
  fprintf(stderr, "sgl-tpu-pdlb listening on :%d policy=%s (%zuP/%zuD)\n",
          port, g_lb.policy.c_str(), g_lb.prefill.size(), g_lb.decode.size());
  while (true) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) continue;
    std::thread(HandleConn, cfd).detach();
  }
}
