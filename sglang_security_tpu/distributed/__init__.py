"""Multi-host control plane.

The TPU-native analog of the reference's torch.distributed /
parallel_state init (``srt/distributed/parallel_state.py:1102``): one
JAX process per host joins a ``jax.distributed`` cluster, after which
``jax.devices()`` spans every host and the (dp, pp, tp) mesh rides ICI
within a slice and DCN across slices — collectives are placed by XLA,
no process groups to manage.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_initialized = False


def maybe_init_distributed(server_args) -> bool:
    """Join the multi-host cluster when nnodes > 1 (idempotent).

    Called before any device query.  ``dist_init_addr`` is the
    coordinator (node 0) address, as in the reference's
    ``--dist-init-addr``."""
    global _initialized
    if server_args.nnodes <= 1:
        return False
    if _initialized:
        return True
    if not server_args.dist_init_addr:
        raise ValueError(
            "nnodes > 1 requires --dist-init-addr host:port "
            "(the node-0 coordinator)"
        )
    if not (0 <= server_args.node_rank < server_args.nnodes):
        raise ValueError(
            f"node_rank {server_args.node_rank} out of range for "
            f"nnodes={server_args.nnodes}"
        )
    import jax

    jax.distributed.initialize(
        coordinator_address=server_args.dist_init_addr,
        num_processes=server_args.nnodes,
        process_id=server_args.node_rank,
    )
    _initialized = True
    logger.info(
        "joined jax.distributed cluster: node %d/%d via %s (%d devices)",
        server_args.node_rank, server_args.nnodes,
        server_args.dist_init_addr, len(jax.devices()),
    )
    return True
