"""Shared utilities: shape bucketing, dtype maps, logging, timing."""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import List, Sequence

import numpy as np

logger = logging.getLogger("sgl_tpu")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_bucket(x: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= x; falls back to round_up to the largest bucket's
    granularity if x exceeds all buckets (keeps recompiles rare, SURVEY §7
    'hard parts': dynamic batching vs XLA static shapes)."""
    for b in buckets:
        if x <= b:
            return b
    return round_up(x, buckets[-1])


def get_dtype(name: str):
    import jax.numpy as jnp

    return {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float32": jnp.float32,
        "fp32": jnp.float32,
        "float16": jnp.bfloat16,  # no fp16 MXU path on TPU; map to bf16
        "int8": jnp.int8,
        "fp8": jnp.float8_e4m3fn,
        "fp8_e4m3": jnp.float8_e4m3fn,
        "fp8_e5m2": jnp.float8_e5m2,
    }[name]


def configure_logger(level: str = "info") -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="[%(asctime)s %(name)s %(levelname)s] %(message)s",
        datefmt="%H:%M:%S",
    )


def is_tpu_backend() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


def use_interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU (tests use the CPU backend)."""
    if os.environ.get("SGL_TPU_FORCE_INTERPRET", "") == "1":
        return True
    return not is_tpu_backend()


class Timer:
    """Context-manager wall timer used by perf logging and TimeStats."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def set_random_seed(seed: int) -> None:
    import random

    random.seed(seed)
    np.random.seed(seed % (2**32))


@functools.lru_cache(maxsize=None)
def get_num_devices() -> int:
    import jax

    return jax.device_count()


def kill_process_tree(pid: int | None = None, include_parent: bool = True) -> None:
    """Terminate a process and its children (failure-propagation path,
    parity with reference engine.py:513-531). Never pattern-kills."""
    import psutil

    try:
        parent = psutil.Process(pid) if pid is not None else psutil.Process()
    except psutil.NoSuchProcess:
        return
    children = parent.children(recursive=True)
    for c in children:
        try:
            c.terminate()
        except psutil.NoSuchProcess:
            pass
    gone, alive = psutil.wait_procs(children, timeout=3)
    for c in alive:
        try:
            c.kill()
        except psutil.NoSuchProcess:
            pass
    if include_parent and pid is not None and pid != os.getpid():
        try:
            parent.terminate()
        except psutil.NoSuchProcess:
            pass
