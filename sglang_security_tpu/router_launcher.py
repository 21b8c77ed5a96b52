"""Python launcher for the native C++ router / PD load balancer.

Builds (once, cached) and spawns the binaries from ``csrc/``.  The
capability analog of the reference's pyo3-bound Rust router entry
(``sgl-router`` python package).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSRC = os.path.join(REPO_ROOT, "csrc")
BUILD = os.path.join(CSRC, "build")


def ensure_built() -> str:
    router = os.path.join(BUILD, "sgl-tpu-router")
    if not os.path.exists(router):
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        subprocess.run(
            ["cmake", "-B", BUILD, *gen], cwd=CSRC, check=True,
            capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", BUILD], cwd=CSRC, check=True,
            capture_output=True,
        )
    return BUILD


def launch_router(
    port: int,
    workers: List[str],
    policy: str = "cache_aware",
    cache_threshold: float = 0.5,
    workers_file: str = None,
    discovery_interval: int = 5,
    health_check_interval: int = 10,
) -> subprocess.Popen:
    build = ensure_built()
    cmd = [
        os.path.join(build, "sgl-tpu-router"),
        "--port", str(port),
        "--policy", policy,
        "--cache-threshold", str(cache_threshold),
        "--health-check-interval", str(health_check_interval),
    ]
    if workers_file:
        cmd += ["--workers-file", workers_file,
                "--discovery-interval", str(discovery_interval)]
    for w in workers:
        cmd += ["--worker", w.replace("http://", "")]
    return subprocess.Popen(cmd)


def launch_pdlb(
    port: int,
    prefill: List[str],
    decode: List[str],
    policy: str = "power_of_two",
) -> subprocess.Popen:
    build = ensure_built()
    cmd = [os.path.join(build, "sgl-tpu-pdlb"), "--port", str(port),
           "--policy", policy]
    for p in prefill:
        cmd += ["--prefill", p.replace("http://", "")]
    for d in decode:
        cmd += ["--decode", d.replace("http://", "")]
    return subprocess.Popen(cmd)
