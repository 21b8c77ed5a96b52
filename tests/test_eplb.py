"""EPLB: algorithms, routing remap, distribution recorder, and engine
rebalance (reference eplb_manager.py / eplb_algorithms/deepseek.py /
expert_distribution.py)."""

import numpy as np
import pytest

from sglang_security_tpu.parallel.eplb import (
    EPLBManager,
    ExpertDistributionRecorder,
    balanced_packing,
    rebalance_experts,
    replicate_experts,
    _device_imbalance,
)


def test_balanced_packing_exact_fill_and_balance():
    rng = np.random.default_rng(0)
    w = rng.uniform(1, 10, (3, 16))
    pack, rank = balanced_packing(w, 4)
    for i in range(3):
        counts = np.bincount(pack[i], minlength=4)
        assert (counts == 4).all()
        # every (pack, rank) slot used exactly once
        assert len({(p, r) for p, r in zip(pack[i], rank[i])}) == 16
        loads = np.zeros(4)
        np.add.at(loads, pack[i], w[i])
        assert loads.max() / loads.mean() < 1.35


def test_replicate_experts_targets_hot():
    w = np.array([[100.0, 1, 1, 1]])
    phy2log, rank, logcnt = replicate_experts(w, 7)
    assert logcnt[0, 0] == 4  # the hot expert got all 3 redundant slots
    assert (np.sort(phy2log[0, 4:]) == [0, 0, 0]).all()
    assert (phy2log[0, :4] == np.arange(4)).all()


def test_rebalance_experts_maps_consistent_and_balanced():
    rng = np.random.default_rng(1)
    w = rng.zipf(1.5, (2, 8)).astype(float)
    P, D = 12, 4
    phy2log, log2phy, logcnt = rebalance_experts(w, P, D)
    assert phy2log.shape == (2, P)
    for i in range(2):
        # every logical expert appears logcnt times
        assert (np.bincount(phy2log[i], minlength=8) == logcnt[i]).all()
        # log2phy inverts phy2log
        for e in range(8):
            phys = log2phy[i, e][log2phy[i, e] >= 0]
            assert len(phys) == logcnt[i, e]
            assert (phy2log[i, phys] == e).all()
    # placement beats naive identity-order packing for skewed loads
    ident_p2l, _, ident_cnt = replicate_experts(w, P)
    assert _device_imbalance(w, phy2log, logcnt, D) <= _device_imbalance(
        w, ident_p2l, ident_cnt, D
    ) + 1e-9


def test_moe_remap_matches_unreplicated():
    import jax.numpy as jnp

    from sglang_security_tpu.layers.moe import moe_ffn

    rng = np.random.default_rng(2)
    T, H, I, E, k = 12, 16, 32, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    ref = moe_ffn(x, router, wg, wd, top_k=k)

    P = 12
    phy2log, log2phy, logcnt = rebalance_experts(
        np.ones((1, E)), P, 1
    )
    wg_p = wg[jnp.asarray(phy2log[0])]
    wd_p = wd[jnp.asarray(phy2log[0])]
    out = moe_ffn(
        x, router, wg_p, wd_p, top_k=k,
        log2phy=jnp.asarray(log2phy[0], jnp.int32),
        logcnt=jnp.asarray(np.maximum(logcnt[0], 1), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-4, atol=2e-5)


def test_recorder_collects_counts_from_jit():
    import jax
    import jax.numpy as jnp

    from sglang_security_tpu.layers.moe import moe_ffn, topk_routing

    rng = np.random.default_rng(3)
    T, H, I, E, k = 10, 16, 32, 4, 2
    L = 2
    rec = ExpertDistributionRecorder(L, E, window=8)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)

    @jax.jit
    def step(x):
        h = moe_ffn(x, router, wg, wd, top_k=k,
                    stats_cb=rec.on_layer_counts)
        h = moe_ffn(h, router, wg, wd, top_k=k,
                    stats_cb=rec.on_layer_counts)
        return h

    step(x).block_until_ready()
    assert rec.num_passes == 1
    counts = rec.dump()
    assert counts.shape == (L, E)
    assert counts.sum() == 2 * T * k
    # layer-0 counts match recomputed routing
    _, ids = topk_routing(
        jnp.dot(x, router).astype(jnp.float32), k
    )
    expect = np.bincount(np.asarray(ids).reshape(-1), minlength=E)
    assert (counts[0] == expect).all()


def test_manager_rebalances_on_schedule():
    rec = ExpertDistributionRecorder(1, 4, window=16)
    applied = []
    mgr = EPLBManager(rec, num_physical_experts=6, num_devices=2,
                      rebalance_every=3,
                      apply_fn=lambda *a: applied.append(a))
    skew = np.array([90, 5, 3, 2], np.int32)
    for _ in range(3):
        rec.on_layer_counts(skew)
        mgr.on_forward_end()
    assert len(applied) == 1
    phy2log, log2phy, logcnt = applied[0]
    assert logcnt[0, 0] == 3  # hot expert replicated into both slots


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    from sglang_security_tpu.test_utils import make_tiny_mixtral

    path = str(tmp_path_factory.mktemp("tiny_eplb") / "mixtral")
    make_tiny_mixtral(path)
    return path


def _engine(path, **kw):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs

    return Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=2048,
        page_size=8, prefill_token_buckets=[64], decode_bs_buckets=[1, 2],
        max_seq_pages_buckets=[8], random_seed=0, enable_warmup=False,
        log_level="warning", **kw,
    ))


def test_engine_eplb_outputs_match_and_rebalance_fires(tiny_mixtral):
    sp = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}
    prompts = ["the quick brown", "pack my box with"]

    eng = _engine(tiny_mixtral)
    base = [o["output_ids"] for o in eng.generate(
        prompt=prompts, sampling_params=sp)]
    eng.shutdown()

    eng = _engine(
        tiny_mixtral, enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_num_iterations=4,
    )
    got = [o["output_ids"] for o in eng.generate(
        prompt=prompts, sampling_params=sp)]
    runner = eng.scheduler.runner
    assert runner.eplb_manager is not None
    assert runner.eplb_recorder.num_passes > 0
    # replicas are exact copies -> greedy outputs identical
    assert got == base
    # drive enough passes to trigger a live rebalance, then serve again
    for _ in range(3):
        eng.generate(prompt=prompts, sampling_params=sp)
    assert runner.eplb_manager.rebalances >= 1
    again = [o["output_ids"] for o in eng.generate(
        prompt=prompts, sampling_params=sp)]
    assert again == base
    eng.shutdown()


def test_weight_update_preserves_eplb_placement(tiny_mixtral, tmp_path):
    """update_weights_from_disk under EPLB must re-expand the fresh
    logical expert stacks into the physical placement (and keep the
    routing maps), or a later rebalance corrupts the gather."""
    sp = {"temperature": 0.0, "max_new_tokens": 6, "ignore_eos": True}
    eng = _engine(
        tiny_mixtral, enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_num_iterations=3,
    )
    base = eng.generate(prompt="the quick", sampling_params=sp)["output_ids"]
    eng.update_weights_from_disk(tiny_mixtral)
    layers = eng.scheduler.runner.params["layers"]
    E_cfg = eng.scheduler.runner.config.num_experts
    assert layers["experts_gate_up"].shape[1] == E_cfg + 2
    assert "eplb_log2phy" in layers
    assert eng.generate(
        prompt="the quick", sampling_params=sp)["output_ids"] == base
    # rebalances after the update still work
    for _ in range(4):
        eng.generate(prompt="the quick", sampling_params=sp)
    assert eng.scheduler.runner.eplb_manager.rebalances >= 1
    assert eng.generate(
        prompt="the quick", sampling_params=sp)["output_ids"] == base
    eng.shutdown()
