// Cache-aware routing radix tree.
//
// C++ re-creation of the capability of the reference's Rust router tree
// (sgl-router/src/tree.rs: approximate character-level radix with
// per-tenant LRU eviction): maps prompt prefixes to the worker that most
// recently served them so requests with shared prefixes land on the
// worker whose radix KV-cache already holds the prefix.

#pragma once

#include <algorithm>
#include <chrono>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace sgl_tpu_router {

class RadixTree {
 public:
  explicit RadixTree(size_t max_chars_per_tenant = 1 << 20)
      : max_per_tenant_(max_chars_per_tenant) {}

  // Returns (matched_prefix_len, worker) for the longest cached prefix.
  std::pair<size_t, std::string> PrefixMatch(const std::string& text) {
    std::lock_guard<std::mutex> lk(mu_);
    Node* node = &root_;
    size_t matched = 0;
    std::string last_tenant;
    size_t pos = 0;
    while (pos < text.size()) {
      auto it = node->children.find(text[pos]);
      if (it == node->children.end()) break;
      Node* child = it->second.get();
      size_t n = CommonPrefix(text, pos, child->key);
      if (n == 0) break;
      matched += n;
      pos += n;
      if (n < child->key.size()) {
        if (!child->tenant.empty()) last_tenant = child->tenant;
        break;
      }
      child->last_access = Now();
      if (!child->tenant.empty()) last_tenant = child->tenant;
      node = child;
    }
    return {matched, last_tenant};
  }

  void Insert(const std::string& text, const std::string& tenant) {
    std::lock_guard<std::mutex> lk(mu_);
    Node* node = &root_;
    size_t pos = 0;
    while (pos < text.size()) {
      auto it = node->children.find(text[pos]);
      if (it == node->children.end()) {
        auto child = std::make_unique<Node>();
        child->key = text.substr(pos);
        child->tenant = tenant;
        child->last_access = Now();
        tenant_chars_[tenant] += child->key.size();
        Node* raw = child.get();
        raw->parent = node;
        node->children[text[pos]] = std::move(child);
        break;
      }
      Node* child = it->second.get();
      size_t n = CommonPrefix(text, pos, child->key);
      if (n < child->key.size()) {
        SplitNode(child, n);
      }
      child->tenant = tenant;
      child->last_access = Now();
      node = child;
      pos += n;
    }
    EvictIfNeeded(tenant);
  }

  void RemoveTenant(const std::string& tenant) {
    std::lock_guard<std::mutex> lk(mu_);
    RemoveTenantRec(&root_, tenant);
    tenant_chars_.erase(tenant);
  }

  size_t TenantChars(const std::string& tenant) {
    std::lock_guard<std::mutex> lk(mu_);
    auto it = tenant_chars_.find(tenant);
    return it == tenant_chars_.end() ? 0 : it->second;
  }

 private:
  struct Node {
    std::string key;
    std::string tenant;  // worker that owns this prefix
    int64_t last_access = 0;
    Node* parent = nullptr;
    std::map<char, std::unique_ptr<Node>> children;
  };

  static int64_t Now() {
    return std::chrono::duration_cast<std::chrono::microseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  }

  static size_t CommonPrefix(const std::string& text, size_t pos,
                             const std::string& key) {
    size_t n = 0;
    while (pos + n < text.size() && n < key.size() &&
           text[pos + n] == key[n]) {
      n++;
    }
    return n;
  }

  void SplitNode(Node* node, size_t at) {
    auto lower = std::make_unique<Node>();
    lower->key = node->key.substr(at);
    lower->tenant = node->tenant;
    lower->last_access = node->last_access;
    lower->children = std::move(node->children);
    lower->parent = node;
    for (auto& kv : lower->children) kv.second->parent = lower.get();
    node->key = node->key.substr(0, at);
    char c = lower->key[0];
    node->children.clear();
    node->children[c] = std::move(lower);
  }

  void EvictIfNeeded(const std::string& tenant) {
    // LRU eviction of this tenant's leaves past the char budget.
    while (tenant_chars_[tenant] > max_per_tenant_) {
      Node* victim = nullptr;
      FindLruLeaf(&root_, tenant, &victim);
      if (victim == nullptr || victim->parent == nullptr) return;
      tenant_chars_[tenant] -= victim->key.size();
      victim->parent->children.erase(victim->key[0]);
    }
  }

  void FindLruLeaf(Node* node, const std::string& tenant, Node** best) {
    for (auto& kv : node->children) {
      Node* c = kv.second.get();
      if (c->children.empty()) {
        if (c->tenant == tenant &&
            (*best == nullptr || c->last_access < (*best)->last_access)) {
          *best = c;
        }
      } else {
        FindLruLeaf(c, tenant, best);
      }
    }
  }

  void RemoveTenantRec(Node* node, const std::string& tenant) {
    for (auto it = node->children.begin(); it != node->children.end();) {
      Node* c = it->second.get();
      RemoveTenantRec(c, tenant);
      if (c->tenant == tenant && c->children.empty()) {
        it = node->children.erase(it);
      } else {
        if (c->tenant == tenant) c->tenant.clear();
        ++it;
      }
    }
  }

  Node root_;
  std::mutex mu_;
  size_t max_per_tenant_;
  std::unordered_map<std::string, size_t> tenant_chars_;
};

}  // namespace sgl_tpu_router
