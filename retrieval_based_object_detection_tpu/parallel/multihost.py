"""Multi-host (DCN) orchestration helpers.

The reference has no distributed execution at all (SURVEY.md §2 audit).
For gallery scale-out beyond one pod slice and multi-host embedding jobs,
this module wraps ``jax.distributed`` bootstrap and provides the
host-sharding conventions:

  * ICI (within a slice): gallery rows shard over the ``gallery`` mesh
    axis, batches over ``dp`` — collectives ride the fast interconnect
    (gallery/sharded.py, parallel/sharding.py).
  * DCN (across hosts): each host owns a contiguous row range of the
    global gallery (``host_shard_range``); queries broadcast to all hosts
    and per-host top-k merge host-side (k is tiny, so DCN traffic is
    O(hosts × k) per query batch).

Single-process usage needs none of this; every function degrades to a
no-op/identity when jax.process_count() == 1.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var passthrough; no-op if the
    runtime is already initialised or single-process args are absent."""
    import jax

    if coordinator_address is None and num_processes is None:
        return  # single-process run
    # State check first (version-stable): jax.distributed keeps its
    # client in module-global state once initialised. The RuntimeError
    # message match below stays only as a fallback for jax versions
    # where this attribute moves (ADVICE r4: string-matching alone
    # turns a benign re-init into a crash when the wording changes).
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialised
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Swallow ONLY double-initialisation. Any other bootstrap
        # failure (bad coordinator address, wrong process_id) must fail
        # loudly: degrading to process_count()==1 would make
        # host_shard_range assign this host the WHOLE gallery and the
        # job would silently produce duplicated/overlapping shards.
        # jax has used both messages across versions: "already
        # initialized" and "should only be called once" (0.9).
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            raise


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def host_shard_range(n_rows: int, process_id: int | None = None,
                     process_count: int | None = None) -> tuple[int, int]:
    """Contiguous [start, end) row range this host owns of a global
    gallery of n_rows (balanced, first hosts take the remainder)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    base = n_rows // pcount
    rem = n_rows % pcount
    start = pid * base + min(pid, rem)
    end = start + base + (1 if pid < rem else 0)
    return start, end


def merge_host_topk(
    per_host_scores: list[np.ndarray],  # each [Q, k]
    per_host_indices: list[np.ndarray],  # each [Q, k], GLOBAL row ids
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side merge of per-host top-k candidate lists (the DCN leg)."""
    scores = np.concatenate(per_host_scores, axis=1)
    indices = np.concatenate(per_host_indices, axis=1)
    order = np.argsort(-scores, axis=1)[:, :k]
    return (np.take_along_axis(scores, order, axis=1),
            np.take_along_axis(indices, order, axis=1))
