"""Prometheus metrics.

Parity with the reference's ``srt/metrics/collector.py``:
scheduler gauges (running/waiting requests, token usage, cache hit rate)
and request histograms (TTFT, inter-token latency, e2e latency, tokens).
"""

from __future__ import annotations

import time
from typing import Optional

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
)

REGISTRY = CollectorRegistry()

num_running_reqs = Gauge(
    "sglang_tpu_num_running_reqs", "Running requests", registry=REGISTRY
)
num_waiting_reqs = Gauge(
    "sglang_tpu_num_waiting_reqs", "Waiting requests", registry=REGISTRY
)
token_usage = Gauge(
    "sglang_tpu_token_usage", "KV pool usage fraction", registry=REGISTRY
)
cache_hit_rate = Gauge(
    "sglang_tpu_cache_hit_rate", "Prefix cache hit rate", registry=REGISTRY
)
safekv_probe_evictions = Counter(
    "sglang_tpu_safekv_probe_evictions",
    "Subtrees freed by the side-channel defense",
    registry=REGISTRY,
)
prompt_tokens_total = Counter(
    "sglang_tpu_prompt_tokens_total", "Prompt tokens", registry=REGISTRY
)
generation_tokens_total = Counter(
    "sglang_tpu_generation_tokens_total", "Generated tokens", registry=REGISTRY
)
cached_tokens_total = Counter(
    "sglang_tpu_cached_tokens_total", "Prefix-cache hits (tokens)",
    registry=REGISTRY,
)
ttft_seconds = Histogram(
    "sglang_tpu_ttft_seconds",
    "Time to first token",
    buckets=[0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2, 5, 10, 30],
    registry=REGISTRY,
)
itl_seconds = Histogram(
    "sglang_tpu_itl_seconds",
    "Inter-token latency",
    buckets=[0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.5, 1],
    registry=REGISTRY,
)
e2e_latency_seconds = Histogram(
    "sglang_tpu_e2e_latency_seconds",
    "End-to-end request latency",
    buckets=[0.1, 0.25, 0.5, 1, 2, 5, 10, 30, 60, 120],
    registry=REGISTRY,
)


_ENABLED = True


def set_enabled(on: bool) -> None:
    """--enable-metrics gate (reference enable_metrics,
    ``server_args.py``): when off, collection becomes a no-op (the
    /metrics endpoint then serves zeros)."""
    global _ENABLED
    _ENABLED = bool(on)


def observe_request(time_stats, prompt_tokens: int, completion_tokens: int,
                    cached_tokens: int) -> None:
    if not _ENABLED:
        return
    prompt_tokens_total.inc(prompt_tokens)
    generation_tokens_total.inc(completion_tokens)
    cached_tokens_total.inc(cached_tokens)
    if time_stats.first_token and time_stats.queued:
        ttft_seconds.observe(time_stats.first_token - time_stats.queued)
    if time_stats.finished and time_stats.first_token and completion_tokens > 1:
        itl_seconds.observe(
            (time_stats.finished - time_stats.first_token)
            / max(completion_tokens - 1, 1)
        )
    if time_stats.finished and time_stats.created:
        e2e_latency_seconds.observe(time_stats.finished - time_stats.created)


def set_scheduler_stats(running: int, waiting: int, usage: float,
                        hit_rate: float) -> None:
    if not _ENABLED:
        return
    num_running_reqs.set(running)
    num_waiting_reqs.set(waiting)
    token_usage.set(usage)
    cache_hit_rate.set(hit_rate)
