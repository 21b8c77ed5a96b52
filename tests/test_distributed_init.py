"""Multi-host control-plane plumbing (reference parallel_state init;
single-host environment only validates flags + idempotence)."""

import pytest

from sglang_security_tpu.distributed import maybe_init_distributed
from sglang_security_tpu.server_args import ServerArgs


def test_single_host_noop(tmp_path):
    args = ServerArgs(model_path=str(tmp_path), nnodes=1)
    assert maybe_init_distributed(args) is False


def test_multihost_requires_coordinator(tmp_path):
    args = ServerArgs(model_path=str(tmp_path), nnodes=2, node_rank=0)
    with pytest.raises(ValueError, match="dist-init-addr"):
        maybe_init_distributed(args)


def test_multihost_validates_rank(tmp_path):
    args = ServerArgs(model_path=str(tmp_path), nnodes=2, node_rank=5,
                      dist_init_addr="10.0.0.1:9000")
    with pytest.raises(ValueError, match="out of range"):
        maybe_init_distributed(args)
