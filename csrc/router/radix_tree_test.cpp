// Unit tests for the cache-aware routing tree (parity with the
// reference's #[test] coverage in sgl-router/src/tree.rs).

#include <cassert>
#include <cstdio>
#include <string>

#include "radix_tree.h"

using sgl_tpu_router::RadixTree;

int main() {
  {
    RadixTree t;
    t.Insert("hello world", "w1");
    auto [n, w] = t.PrefixMatch("hello world");
    assert(n == 11 && w == "w1");
    auto [n2, w2] = t.PrefixMatch("hello there");
    assert(n2 == 6 && w2 == "w1");
    auto [n3, w3] = t.PrefixMatch("goodbye");
    assert(n3 == 0 && w3.empty());
  }
  {
    // split + ownership handoff
    RadixTree t;
    t.Insert("abcdef", "w1");
    t.Insert("abcxyz", "w2");
    auto [n1, w1] = t.PrefixMatch("abcdef");
    assert(n1 == 6 && w1 == "w1");
    auto [n2, w2] = t.PrefixMatch("abcxyz");
    assert(n2 == 6 && w2 == "w2");
  }
  {
    // last-writer owns the shared prefix
    RadixTree t;
    t.Insert("shared prefix A", "w1");
    t.Insert("shared prefix B", "w2");
    auto [n, w] = t.PrefixMatch("shared prefix C");
    assert(n == 14 && (w == "w2"));
  }
  {
    // tenant removal
    RadixTree t;
    t.Insert("abc", "w1");
    t.RemoveTenant("w1");
    auto [n, w] = t.PrefixMatch("abc");
    assert(w.empty());
  }
  {
    // LRU eviction under budget
    RadixTree t(16);
    t.Insert("aaaaaaaa", "w1");  // 8 chars
    t.Insert("bbbbbbbb", "w1");  // 16 total
    t.Insert("cccccccc", "w1");  // exceeds -> evicts LRU leaf(s)
    assert(t.TenantChars("w1") <= 16);
    auto [n, w] = t.PrefixMatch("cccccccc");
    assert(n == 8 && w == "w1");  // newest survives
  }
  printf("radix_tree_test: all ok\n");
  return 0;
}
