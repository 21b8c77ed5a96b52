"""Host-side radix cache + SafeKV unit tests (no device needed)."""

import numpy as np
import pytest

from sglang_security_tpu.global_epoch import global_epoch
from sglang_security_tpu.mem_cache.page_allocator import PageAllocator
from sglang_security_tpu.mem_cache.radix_cache import RadixCache, SafeKVConfig


PAGE = 4


@pytest.fixture
def alloc():
    return PageAllocator(num_pages=257, page_size=PAGE)


def make_cache(alloc, safekv=None):
    return RadixCache(PAGE, free_pages_fn=alloc.free, safekv=safekv)


def toks(n, seed=0):
    return np.arange(seed * 1000, seed * 1000 + n, dtype=np.int32)


class TestAllocator:
    def test_alloc_free_roundtrip(self, alloc):
        p = alloc.alloc(10)
        assert len(p) == 10 and 0 not in p
        alloc.free(p)
        assert alloc.check_balance()

    def test_oom_returns_none(self, alloc):
        assert alloc.alloc(1000) is None

    def test_double_free_asserts(self, alloc):
        p = alloc.alloc(2)
        alloc.free(p)
        with pytest.raises(AssertionError):
            alloc.free(p)


class TestRadixBasics:
    def test_miss_then_hit(self, alloc):
        c = make_cache(alloc)
        t = toks(16)
        assert c.match_prefix(t).num_tokens == 0
        pages = alloc.alloc(4)
        dup = c.insert(t, pages)
        assert dup == 0
        m = c.match_prefix(t)
        assert m.num_tokens == 16
        np.testing.assert_array_equal(m.pages, pages)

    def test_partial_match_splits(self, alloc):
        c = make_cache(alloc)
        t = toks(16)
        pages = alloc.alloc(4)
        c.insert(t, pages)
        t2 = t.copy()
        t2[8:] += 7777  # diverge at page 2
        m = c.match_prefix(t2)
        assert m.num_tokens == 8
        np.testing.assert_array_equal(m.pages, pages[:2])

    def test_insert_dedup_count(self, alloc):
        c = make_cache(alloc)
        t = toks(16)
        p1 = alloc.alloc(4)
        c.insert(t, p1)
        t2 = np.concatenate([t, toks(8, seed=5)])
        p2 = alloc.alloc(6)
        dup = c.insert(t2, p2)
        assert dup == 4  # first 4 pages were already cached
        m = c.match_prefix(t2)
        assert m.num_tokens == 24
        np.testing.assert_array_equal(m.pages[:4], p1)
        np.testing.assert_array_equal(m.pages[4:], p2[4:])

    def test_unaligned_tail_not_cached(self, alloc):
        c = make_cache(alloc)
        t = toks(10)  # 2.5 pages
        pages = alloc.alloc(3)
        c.insert(t, pages)
        assert c.match_prefix(t).num_tokens == 8

    def test_evict_lru(self, alloc):
        c = make_cache(alloc)
        a, b = toks(8, 1), toks(8, 2)
        pa, pb = alloc.alloc(2), alloc.alloc(2)
        c.insert(a, pa)
        c.insert(b, pb)
        c.match_prefix(b)  # b is most recent
        freed = c.evict(2)
        assert freed == 2
        assert c.match_prefix(a).num_tokens == 0  # a was evicted
        assert c.match_prefix(b).num_tokens == 8

    def test_locked_nodes_not_evicted(self, alloc):
        c = make_cache(alloc)
        a = toks(8, 1)
        pa = alloc.alloc(2)
        c.insert(a, pa)
        m = c.match_prefix(a)
        c.inc_lock_ref(m.last_node)
        assert c.evict(10) == 0
        c.dec_lock_ref(m.last_node)
        assert c.evict(10) == 2

    def test_lock_ref_accounting(self, alloc):
        c = make_cache(alloc)
        a = toks(16, 1)
        c.insert(a, alloc.alloc(4))
        m = c.match_prefix(a)
        c.inc_lock_ref(m.last_node)
        assert c.protected_pages == 4 and c.evictable_pages == 0
        c.dec_lock_ref(m.last_node)
        assert c.protected_pages == 0 and c.evictable_pages == 4


class TestSafeKV:
    def cfg(self, **kw):
        return SafeKVConfig(enabled=True, **kw)

    def test_private_by_default_blocks_other_users(self, alloc):
        c = make_cache(alloc, self.cfg())
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="alice")
        assert c.match_prefix(t, user_id="alice").num_tokens == 16
        assert c.match_prefix(t, user_id="bob").num_tokens == 0
        assert c.match_prefix(t, user_id=None).num_tokens == 0

    def test_public_verdict_enables_sharing(self, alloc):
        c = make_cache(alloc, self.cfg())
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="alice")
        node = c.match_prefix(t, user_id="alice").last_node
        c.apply_privacy_verdict(node, is_private=False)
        assert c.match_prefix(t, user_id="bob").num_tokens == 16

    def test_parallel_private_branches_then_merge(self, alloc):
        c = make_cache(alloc, self.cfg())
        t = toks(16)
        pa = alloc.alloc(4)
        pb = alloc.alloc(4)
        c.insert(t, pa, user_id="alice")
        dup = c.insert(t, pb, user_id="bob")
        assert dup == 0  # bob cannot share alice's private branch
        assert c.match_prefix(t, user_id="bob").num_tokens == 16
        na = c.match_prefix(t, user_id="alice").last_node
        nb = c.match_prefix(t, user_id="bob").last_node
        assert na is not nb
        # both verdicts public -> siblings merge, duplicate pages freed
        before = alloc.available_pages
        c.apply_privacy_verdict(na, False)
        c.apply_privacy_verdict(nb, False)
        assert alloc.available_pages == before + 4
        assert c.match_prefix(t, user_id="carol").num_tokens == 16

    def test_extension_under_public_parent_rechecked(self, alloc):
        """A public parent from an EARLIER request must not whitelist a
        new continuation: the parent's verdict never saw the new text
        (e.g. a PII-bearing turn appended to a public system prompt).
        The extension gets its own check and stays private meanwhile."""
        hooked = []
        cfg = self.cfg(privacy_checker=lambda n, txt: hooked.append(n))
        c = make_cache(alloc, cfg)
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="alice", prompt_text="benign sys")
        assert len(hooked) == 1
        c.apply_privacy_verdict(hooked[0], False)
        t2 = np.concatenate([t, toks(8, seed=9)])
        c.insert(
            t2,
            np.concatenate([c.match_prefix(t, "alice").pages, alloc.alloc(2)]),
            user_id="alice",
            prompt_text="benign sys + my ssn is 123-45-6789",
        )
        # the continuation was re-submitted for its own check ...
        assert len(hooked) == 2
        # ... and until its verdict lands, bob only shares the public head
        assert c.match_prefix(t2, user_id="bob").num_tokens == 16
        # a private verdict keeps it that way; alice still matches fully
        c.apply_privacy_verdict(hooked[1], True)
        assert c.match_prefix(t2, user_id="bob").num_tokens == 16
        assert c.match_prefix(t2, user_id="alice").num_tokens == 24

    def test_same_prompt_public_verdict_covers_chunks(self, alloc):
        """Re-inserting under a parent judged public on the SAME prompt
        text inherits without a duplicate check (sibling-chunk case)."""
        hooked = []
        cfg = self.cfg(privacy_checker=lambda n, txt: hooked.append(n))
        c = make_cache(alloc, cfg)
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="alice", prompt_text="same text")
        assert len(hooked) == 1
        c.apply_privacy_verdict(hooked[0], False)
        t2 = np.concatenate([t, toks(8, seed=9)])
        c.insert(
            t2,
            np.concatenate([c.match_prefix(t, "alice").pages, alloc.alloc(2)]),
            user_id="alice",
            prompt_text="same text",
        )
        # same judged text -> inherited public, no re-check, bob shares
        assert len(hooked) == 1
        assert c.match_prefix(t2, user_id="bob").num_tokens == 24

    def test_probe_defense_frees_subtree(self, alloc):
        global_epoch.reset()
        c = make_cache(alloc, self.cfg(spike_threshold=5, min_baseline_hits=1,
                                       concentration_threshold=3))
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="attacker")
        # hammer the same prefix as a single user within one epoch window
        triggered = False
        for _ in range(30):
            m = c.match_prefix(t, user_id="attacker")
            if m.num_tokens == 0:
                triggered = True
                break
        assert triggered, "probe spike should have freed the subtree"
        assert alloc.check_balance()

    def test_diverse_users_not_flagged(self, alloc):
        global_epoch.reset()
        c = make_cache(alloc, self.cfg(spike_threshold=5, min_baseline_hits=1,
                                       concentration_threshold=3))
        t = toks(16)
        c.insert(t, alloc.alloc(4), user_id="alice")
        node = c.match_prefix(t, "alice").last_node
        c.apply_privacy_verdict(node, False)
        for i in range(60):
            m = c.match_prefix(t, user_id=f"user{i}")
            assert m.num_tokens == 16  # popular-but-diverse is never evicted


class TestChunkCache:
    def test_never_shares(self, alloc):
        from sglang_security_tpu.mem_cache.chunk_cache import ChunkCache

        c = ChunkCache(PAGE, alloc.free)
        t = toks(16)
        p = alloc.alloc(4)
        dup = c.insert(t, p)
        assert dup == 4
        alloc.free(p)
        assert c.match_prefix(t).num_tokens == 0
        assert alloc.check_balance()
