// sgl-tpu-router: cache-aware data-parallel HTTP router.
//
// C++ re-creation of the reference's Rust sgl-router
// (sgl-router/src/router.rs + tree.rs + server.rs): fronts N engine
// replicas, routes by policy:
//   cache_aware — longest-prefix match against a per-worker radix tree of
//                 recently served prompts; falls back to shortest-queue
//                 when the match is weak or the owner is overloaded
//   round_robin / random / shortest_queue
// Admin endpoints: /health, /metrics (Prometheus text), /add_worker,
// /remove_worker, /list_workers.
//
// Service discovery (the file-based analog of the reference router's
// k8s --service-discovery watch): --workers-file <path> is polled every
// --discovery-interval seconds; lines of host:port are diffed against
// the live set (in k8s, a configmap/sidecar materializes the endpoint
// list into that file). A background health checker probes every worker
// each --health-check-interval seconds, evicting dead ones from rotation
// and RECOVERING them when they answer again.
//
// Build: see csrc/CMakeLists.txt (target sgl-tpu-router).

#include <atomic>
#include <chrono>
#include <fstream>
#include <set>
#include <sys/stat.h>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "http.h"
#include "radix_tree.h"

using namespace sgl_tpu_http;
using sgl_tpu_router::RadixTree;

struct Worker {
  std::string host;
  int port;
  std::atomic<int64_t> active{0};
  std::atomic<int64_t> total{0};
  std::atomic<bool> healthy{true};
  Worker(std::string h, int p) : host(std::move(h)), port(p) {}
};

struct Router {
  std::vector<std::unique_ptr<Worker>> workers;
  std::mutex mu;
  std::string policy = "cache_aware";
  double cache_threshold = 0.5;   // min fraction of prompt matched
  int64_t balance_abs_threshold = 32;  // load gap that overrides affinity
  RadixTree tree;
  std::atomic<int64_t> rr{0};
  std::atomic<int64_t> requests{0};
  std::atomic<int64_t> cache_routed{0};

  std::string WorkerKey(const Worker& w) {
    return w.host + ":" + std::to_string(w.port);
  }

  Worker* ByKey(const std::string& key) {
    for (auto& w : workers)
      if (WorkerKey(*w) == key && w->healthy) return w.get();
    return nullptr;
  }

  Worker* ShortestQueue() {
    Worker* best = nullptr;
    for (auto& w : workers) {
      if (!w->healthy) continue;
      // tie-break on total served so idle workers alternate
      if (!best || w->active < best->active ||
          (w->active == best->active && w->total < best->total)) {
        best = w.get();
      }
    }
    return best;
  }

  Worker* Pick(const std::string& routing_text) {
    std::lock_guard<std::mutex> lk(mu);
    if (workers.empty()) return nullptr;
    if (policy == "round_robin") {
      for (size_t i = 0; i < workers.size(); i++) {
        Worker* w = workers[(rr++) % workers.size()].get();
        if (w->healthy) return w;
      }
      return nullptr;
    }
    if (policy == "random") {
      for (size_t i = 0; i < workers.size(); i++) {
        Worker* w = workers[rand() % workers.size()].get();
        if (w->healthy) return w;
      }
      return nullptr;
    }
    if (policy == "shortest_queue" || routing_text.empty()) {
      return ShortestQueue();
    }
    // cache_aware (reference router.rs:31-135 semantics)
    auto [matched, tenant] = tree.PrefixMatch(routing_text);
    Worker* owner =
        tenant.empty() ? nullptr : ByKey(tenant);
    Worker* sq = ShortestQueue();
    Worker* chosen = sq;
    if (owner != nullptr &&
        matched >= cache_threshold * routing_text.size() &&
        owner->active - (sq ? sq->active.load() : 0) <=
            balance_abs_threshold) {
      chosen = owner;
      cache_routed++;
    }
    if (chosen != nullptr) {
      tree.Insert(routing_text, WorkerKey(*chosen));
    }
    return chosen;
  }
};

static Router g_router;

static void HandleConn(int fd) {
  Request req;
  if (!ReadRequest(fd, &req)) {
    close(fd);
    return;
  }
  g_router.requests++;
  if (req.path == "/health") {
    Respond(fd, 200, "{\"status\":\"ok\"}");
  } else if (req.path == "/list_workers") {
    std::ostringstream out;
    out << "{\"workers\":[";
    {
      std::lock_guard<std::mutex> lk(g_router.mu);
      for (size_t i = 0; i < g_router.workers.size(); i++) {
        auto& w = g_router.workers[i];
        if (i) out << ",";
        out << "{\"url\":\"" << w->host << ":" << w->port
            << "\",\"active\":" << w->active
            << ",\"total\":" << w->total
            << ",\"healthy\":" << (w->healthy ? "true" : "false") << "}";
      }
    }
    out << "]}";
    Respond(fd, 200, out.str());
  } else if (req.path.rfind("/add_worker", 0) == 0) {
    // /add_worker?url=host:port
    auto q = req.path.find("url=");
    if (q == std::string::npos) {
      Respond(fd, 400, "{\"error\":\"missing url\"}");
    } else {
      std::string url = req.path.substr(q + 4);
      auto colon = url.rfind(':');
      std::string host = url.substr(0, colon);
      int port = atoi(url.c_str() + colon + 1);
      {
        std::lock_guard<std::mutex> lk(g_router.mu);
        g_router.workers.emplace_back(new Worker(host, port));
      }
      Respond(fd, 200, "{\"success\":true}");
    }
  } else if (req.path.rfind("/remove_worker", 0) == 0) {
    auto q = req.path.find("url=");
    std::string url = q == std::string::npos ? "" : req.path.substr(q + 4);
    {
      std::lock_guard<std::mutex> lk(g_router.mu);
      for (auto it = g_router.workers.begin(); it != g_router.workers.end();
           ++it) {
        if (g_router.WorkerKey(**it) == url) {
          g_router.tree.RemoveTenant(url);
          g_router.workers.erase(it);
          break;
        }
      }
    }
    Respond(fd, 200, "{\"success\":true}");
  } else if (req.path == "/metrics") {
    std::ostringstream out;
    out << "# TYPE sgl_router_requests_total counter\n"
        << "sgl_router_requests_total " << g_router.requests << "\n"
        << "# TYPE sgl_router_cache_routed_total counter\n"
        << "sgl_router_cache_routed_total " << g_router.cache_routed << "\n";
    {
      std::lock_guard<std::mutex> lk(g_router.mu);
      for (auto& w : g_router.workers) {
        out << "sgl_router_worker_active{worker=\"" << g_router.WorkerKey(*w)
            << "\"} " << w->active << "\n";
      }
    }
    Respond(fd, 200, out.str(), "text/plain");
  } else {
    // proxy to a worker
    std::string key;
    if (auto t = JsonStringField(req.body, "text"))
      key = *t;
    else if (auto p = JsonStringField(req.body, "prompt"))
      key = *p;
    else if (auto c = JsonStringField(req.body, "content"))
      key = *c;
    Worker* w = g_router.Pick(key);
    if (w == nullptr) {
      Respond(fd, 503, "{\"error\":\"no healthy workers\"}");
    } else {
      w->active++;
      w->total++;
      bool ok = ProxyRequest(req, w->host, w->port, fd);
      w->active--;
      if (!ok) {
        // don't mark unhealthy on client aborts; only on connect failure
        int probe = Connect(w->host, w->port);
        if (probe < 0) {
          w->healthy = false;
        } else {
          close(probe);
        }
      }
    }
  }
  close(fd);
}

static void SyncWorkersFromFile(const std::string& path) {
  std::ifstream f(path);
  if (!f.good()) return;
  std::set<std::string> want;
  std::string line;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == ' '))
      line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    want.insert(line);
  }
  std::lock_guard<std::mutex> lk(g_router.mu);
  for (auto it = g_router.workers.begin(); it != g_router.workers.end();) {
    std::string key = g_router.WorkerKey(**it);
    if (!want.count(key)) {
      fprintf(stderr, "router: discovery removed %s\n", key.c_str());
      g_router.tree.RemoveTenant(key);
      it = g_router.workers.erase(it);
    } else {
      want.erase(key);
      ++it;
    }
  }
  for (const auto& url : want) {
    auto colon = url.rfind(':');
    if (colon == std::string::npos) continue;
    fprintf(stderr, "router: discovery added %s\n", url.c_str());
    g_router.workers.emplace_back(
        new Worker(url.substr(0, colon), atoi(url.c_str() + colon + 1)));
  }
}

static void DiscoveryLoop(std::string path, int interval_s) {
  // re-read every poll: the sync is a cheap diff and mtime granularity
  // (1 s) can miss rapid updates
  while (true) {
    SyncWorkersFromFile(path);
    std::this_thread::sleep_for(std::chrono::seconds(interval_s));
  }
}

static void HealthLoop(int interval_s) {
  while (true) {
    std::vector<std::pair<std::string, int>> targets;
    {
      std::lock_guard<std::mutex> lk(g_router.mu);
      for (auto& w : g_router.workers)
        targets.emplace_back(w->host, w->port);
    }
    for (auto& [host, port] : targets) {
      int fd = Connect(host, port);
      bool up = fd >= 0;
      if (fd >= 0) close(fd);
      std::lock_guard<std::mutex> lk(g_router.mu);
      for (auto& w : g_router.workers) {
        if (w->host == host && w->port == port && w->healthy != up) {
          fprintf(stderr, "router: worker %s:%d -> %s\n", host.c_str(),
                  port, up ? "healthy" : "UNHEALTHY");
          w->healthy = up;
        }
      }
    }
    std::this_thread::sleep_for(std::chrono::seconds(interval_s));
  }
}

int main(int argc, char** argv) {
  int port = 30080;
  std::string workers_file;
  int discovery_interval = 5;
  int health_interval = 10;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--policy" && i + 1 < argc) g_router.policy = argv[++i];
    else if (a == "--cache-threshold" && i + 1 < argc)
      g_router.cache_threshold = atof(argv[++i]);
    else if (a == "--workers-file" && i + 1 < argc) workers_file = argv[++i];
    else if (a == "--discovery-interval" && i + 1 < argc)
      discovery_interval = atoi(argv[++i]);
    else if (a == "--health-check-interval" && i + 1 < argc)
      health_interval = atoi(argv[++i]);
    else if (a == "--worker" && i + 1 < argc) {
      std::string url = argv[++i];
      auto colon = url.rfind(':');
      g_router.workers.emplace_back(
          new Worker(url.substr(0, colon), atoi(url.c_str() + colon + 1)));
    }
  }
  if (!workers_file.empty()) {
    SyncWorkersFromFile(workers_file);
    std::thread(DiscoveryLoop, workers_file, discovery_interval).detach();
  }
  if (health_interval > 0) {
    std::thread(HealthLoop, health_interval).detach();
  }
  int lfd = Listen(port);
  if (lfd < 0) {
    fprintf(stderr, "router: failed to listen on %d\n", port);
    return 1;
  }
  fprintf(stderr, "sgl-tpu-router listening on :%d policy=%s workers=%zu\n",
          port, g_router.policy.c_str(), g_router.workers.size());
  while (true) {
    int cfd = accept(lfd, nullptr, nullptr);
    if (cfd < 0) continue;
    std::thread(HandleConn, cfd).detach();
  }
}
