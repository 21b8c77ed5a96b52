// Minimal blocking HTTP/1.1 plumbing shared by the router and the PD
// load balancer: request parsing, upstream forwarding with streaming
// (Content-Length, chunked, and SSE/until-close bodies).

#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <map>
#include <optional>
#include <sstream>
#include <string>
#include <vector>

namespace sgl_tpu_http {

struct Request {
  std::string method;
  std::string path;
  std::map<std::string, std::string> headers;  // lower-case keys
  std::string body;
  std::string raw_head;  // original request line + headers
};

inline std::string Lower(std::string s) {
  for (auto& c : s) c = tolower(c);
  return s;
}

inline bool ReadAll(int fd, char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = read(fd, buf + got, n - got);
    if (r <= 0) return false;
    got += r;
  }
  return true;
}

inline bool WriteAll(int fd, const char* buf, size_t n) {
  size_t sent = 0;
  while (sent < n) {
    ssize_t w = write(fd, buf + sent, n - sent);
    if (w <= 0) return false;
    sent += w;
  }
  return true;
}

inline bool WriteAll(int fd, const std::string& s) {
  return WriteAll(fd, s.data(), s.size());
}

// Reads one request (headers + full body). Returns false on EOF/error.
inline bool ReadRequest(int fd, Request* req) {
  std::string data;
  char buf[8192];
  size_t head_end = std::string::npos;
  while (head_end == std::string::npos) {
    ssize_t r = read(fd, buf, sizeof(buf));
    if (r <= 0) return false;
    data.append(buf, r);
    head_end = data.find("\r\n\r\n");
    if (data.size() > (16u << 20)) return false;
  }
  req->raw_head = data.substr(0, head_end + 4);
  std::istringstream hs(data.substr(0, head_end));
  std::string line;
  std::getline(hs, line);
  {
    std::istringstream ls(line);
    ls >> req->method >> req->path;
  }
  while (std::getline(hs, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    auto colon = line.find(':');
    if (colon == std::string::npos) continue;
    std::string k = Lower(line.substr(0, colon));
    size_t v0 = line.find_first_not_of(' ', colon + 1);
    req->headers[k] = v0 == std::string::npos ? "" : line.substr(v0);
  }
  std::string body = data.substr(head_end + 4);
  auto it = req->headers.find("content-length");
  if (it != req->headers.end()) {
    size_t want = std::stoul(it->second);
    while (body.size() < want) {
      ssize_t r = read(fd, buf, sizeof(buf));
      if (r <= 0) return false;
      body.append(buf, r);
    }
    body.resize(want);
  }
  req->body = std::move(body);
  return true;
}

inline int Connect(const std::string& host, int port) {
  struct addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints, &res))
    return -1;
  int fd = -1;
  for (auto* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd >= 0) {
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  }
  return fd;
}

// Forward `req` to upstream host:port and stream the response back to
// `client_fd` (handles content-length, chunked, and until-close bodies).
inline bool ProxyRequest(const Request& req, const std::string& host,
                         int port, int client_fd) {
  int up = Connect(host, port);
  if (up < 0) return false;
  std::ostringstream out;
  out << req.method << " " << req.path << " HTTP/1.1\r\n";
  for (auto& kv : req.headers) {
    if (kv.first == "host" || kv.first == "connection" ||
        kv.first == "content-length")
      continue;
    out << kv.first << ": " << kv.second << "\r\n";
  }
  out << "host: " << host << ":" << port << "\r\n";
  out << "connection: close\r\n";
  out << "content-length: " << req.body.size() << "\r\n\r\n";
  if (!WriteAll(up, out.str()) || !WriteAll(up, req.body)) {
    close(up);
    return false;
  }
  char buf[16384];
  bool ok = true;
  while (true) {
    ssize_t r = read(up, buf, sizeof(buf));
    if (r < 0) ok = false;
    if (r <= 0) break;
    if (!WriteAll(client_fd, buf, r)) {
      ok = false;
      break;
    }
  }
  close(up);
  return ok;
}

inline void Respond(int fd, int code, const std::string& body,
                    const std::string& ctype = "application/json") {
  const char* msg = code == 200   ? "OK"
                    : code == 404 ? "Not Found"
                    : code == 503 ? "Service Unavailable"
                                  : "Bad Request";
  std::ostringstream out;
  out << "HTTP/1.1 " << code << " " << msg << "\r\n"
      << "content-type: " << ctype << "\r\n"
      << "content-length: " << body.size() << "\r\n"
      << "connection: close\r\n\r\n"
      << body;
  WriteAll(fd, out.str());
}

// Crude JSON string-field extractor ("key":"value") for routing keys.
inline std::optional<std::string> JsonStringField(const std::string& body,
                                                 const std::string& key) {
  std::string pat = "\"" + key + "\"";
  size_t k = body.find(pat);
  if (k == std::string::npos) return std::nullopt;
  size_t colon = body.find(':', k + pat.size());
  if (colon == std::string::npos) return std::nullopt;
  size_t q0 = body.find('"', colon + 1);
  if (q0 == std::string::npos) return std::nullopt;
  std::string out;
  for (size_t i = q0 + 1; i < body.size(); i++) {
    char c = body[i];
    if (c == '\\' && i + 1 < body.size()) {
      out.push_back(body[++i]);
    } else if (c == '"') {
      return out;
    } else {
      out.push_back(c);
    }
  }
  return std::nullopt;
}

inline int Listen(int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(port);
  if (bind(fd, (sockaddr*)&addr, sizeof(addr)) != 0) return -1;
  if (listen(fd, 512) != 0) return -1;
  return fd;
}

}  // namespace sgl_tpu_http
