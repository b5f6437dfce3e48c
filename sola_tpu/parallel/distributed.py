"""Multi-host execution helpers.

Generalizes the reference's process-level sharding — N independent python
processes each handling ``video_idx % n_pids == pid``
(generate_tokens_grid.py:96, README.md:93-123) — to the JAX multi-host
model: ``jax.distributed`` over DCN, one process per host, with the same
modulo video assignment plus cross-host metric reduction for evaluation
(psum of J/F sums and confusion counts over the data mesh axis,
SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host; no-op when the
    environment provides the topology (TPU pods auto-configure)."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def shard_for_host(items: Sequence[T],
                   process_id: Optional[int] = None,
                   process_count: Optional[int] = None,
                   strided: bool = True) -> list[T]:
    """This host's share of a work list.

    ``strided=True`` is the tokens-CLI assignment (idx % n == pid);
    ``strided=False`` is the prompts-CLI slice (items[pid::n]) — both are
    the same stride-slice, retained for explicitness at call sites.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    if n <= 1:
        return list(items)
    return [x for i, x in enumerate(items) if i % n == pid]


def all_sum(metrics: dict) -> dict:
    """Sum scalar metrics across processes (single program, host scalars).

    Uses a tiny psum over the global device set; on one process it is the
    identity.
    """
    if jax.process_count() <= 1:
        return dict(metrics)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = jnp.asarray([float(metrics[k]) for k in keys], jnp.float32)
    summed = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(keys)}


def verify_disjoint_coverage(n_items: int, process_count: int) -> bool:
    """Sanity check mirroring SURVEY.md §4.4: the per-host shards form a
    disjoint union of the full work list."""
    seen: list[int] = []
    for pid in range(process_count):
        seen.extend(i for i in range(n_items)
                    if i % process_count == pid)
    return sorted(seen) == list(range(n_items))
