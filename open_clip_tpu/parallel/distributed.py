"""Multi-host initialization (reference ``src/open_clip_train/distributed.py:102-167``).

The reference discovers rank/world from SLURM / torchrun env vars and calls
``init_process_group``; the JAX equivalent is ``jax.distributed.initialize``, after
which ``jax.devices()`` is the *global* device list and one ``Mesh`` spans all hosts —
no DDP wrappers or backend selection. Collectives then ride ICI/DCN automatically via
the sharding annotations.

Env discovery mirrors the reference's variable set plus JAX-native auto-detection
(on TPU pods ``initialize()`` needs no arguments at all).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def world_info_from_env() -> Tuple[Optional[str], Optional[int], Optional[int]]:
    """(coordinator, num_processes, process_id) from the environment.

    Mirrors reference ``world_info_from_env`` (distributed.py:41-64): checks the
    explicit OCT_* names first, then torchrun-style RANK/WORLD_SIZE, then SLURM.
    """
    coord = os.environ.get("OCT_COORDINATOR") or os.environ.get("MASTER_ADDR")
    if coord and ":" not in coord and os.environ.get("MASTER_PORT"):
        coord = f"{coord}:{os.environ['MASTER_PORT']}"
    for size_var, rank_var in (
        ("OCT_NUM_PROCESSES", "OCT_PROCESS_ID"),
        ("WORLD_SIZE", "RANK"),
        ("SLURM_NTASKS", "SLURM_PROCID"),
    ):
        if size_var in os.environ and rank_var in os.environ:
            return coord, int(os.environ[size_var]), int(os.environ[rank_var])
    return coord, None, None


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    auto: bool = False,
) -> Tuple[int, int]:
    """Initialize multi-host JAX if configured; returns (process_index, process_count).

    - explicit args (CLI flags) win;
    - else env discovery (OCT_* / RANK+WORLD_SIZE / SLURM);
    - ``auto=True`` with nothing set calls ``jax.distributed.initialize()`` bare,
      which self-configures on TPU pod slices.
    Single-process (nothing configured, auto=False) is a no-op returning (0, 1).
    """
    global _INITIALIZED
    if not _INITIALIZED:
        env_coord, env_n, env_id = world_info_from_env()
        coordinator = coordinator or env_coord
        num_processes = num_processes if num_processes is not None else env_n
        process_id = process_id if process_id is not None else env_id
        if coordinator and num_processes and num_processes > 1:
            if process_id is None:
                raise ValueError(
                    "multi-host init needs a process id: pass --dist-process-id or set "
                    "one of OCT_PROCESS_ID / RANK / SLURM_PROCID"
                )
            logger.info("jax.distributed.initialize(%s, %d, %d)",
                        coordinator, num_processes, process_id)
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        elif auto:
            jax.distributed.initialize()
            _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """Rank-0 gate for host-side side effects (logging, checkpoint writes, eval) —
    the role of the reference's ``is_master`` (distributed.py:25-27)."""
    return jax.process_index() == 0


def host_psum(values) -> "np.ndarray":
    """Sum a small host-side float vector across processes (eval counts, loss
    sums). Single-process: identity. The reference reduces eval counters with
    ``torch.distributed.all_reduce`` on rank-split loaders
    (reference src/open_clip_train/zero_shot.py:54-109 drives via samplers);
    here every process contributes its local partial sums once per eval."""
    import numpy as np

    vals = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(vals)).sum(axis=0)


def _allgather_ragged(arr) -> "np.ndarray":
    """All processes' rows concatenated in rank order; handles ragged per-rank
    row counts by padding to the max before the (shape-uniform) allgather."""
    import numpy as np
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([arr.shape[0]], np.int64))
    ).reshape(-1)
    m = int(counts.max())
    if arr.shape[0] < m:
        pad = np.zeros((m - arr.shape[0],) + arr.shape[1:], arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    stacked = np.asarray(multihost_utils.process_allgather(arr))  # (W, m, ...)
    return np.concatenate(
        [stacked[r, : int(counts[r])] for r in range(len(counts))], axis=0)


def host_gather_by_index(arr, index) -> "np.ndarray":
    """Gather per-process row blocks onto every process and scatter them to
    their global positions: ``index`` gives each local row's global row id.

    Used by rank-split evaluation to reassemble the full val-set feature matrix
    for retrieval metrics — the result is identical to a single process having
    computed every row in order, for ANY split scheme (the csv eval loader uses
    whole-batch round-robin so the contrastive loss also matches exactly).
    Single-process: returns ``arr`` ordered by ``index``.
    """
    import numpy as np

    arr = np.asarray(arr)
    idx = np.asarray(index, np.int64).reshape(-1)
    if jax.process_count() > 1:
        arr = _allgather_ragged(arr)
        idx = _allgather_ragged(idx)
    out = np.zeros_like(arr)
    out[idx] = arr
    return out


def host_gather_stride(arr) -> "np.ndarray":
    """Gather per-process row blocks onto every process, restoring the global
    order of a stride split (process ``r`` holds global rows ``r, r+W, ...``).
    Fallback for loaders that don't carry explicit ``index`` arrays.
    Single-process: identity.
    """
    import numpy as np

    arr = np.asarray(arr)
    world = jax.process_count()
    if world == 1:
        return arr
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([arr.shape[0]], np.int64))
    ).reshape(-1)
    m = int(counts.max())
    padded = arr
    if arr.shape[0] < m:
        pad = np.zeros((m - arr.shape[0],) + arr.shape[1:], arr.dtype)
        padded = np.concatenate([arr, pad], axis=0)
    stacked = np.asarray(multihost_utils.process_allgather(padded))  # (W, m, ...)
    out = np.zeros((int(counts.sum()),) + arr.shape[1:], arr.dtype)
    for r in range(world):
        out[r::world] = stacked[r, : int(counts[r])]
    return out


def broadcast_scalar_from_primary(value: float) -> float:
    """Agree on a host-side scalar across processes (resume step, early-stop flags):
    the reference broadcasts via torch.distributed; here a tiny jitted psum over the
    global device mesh does it (rank-0 contributes, everyone reads)."""
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return value
    arr = multihost_utils.broadcast_one_to_all(np.asarray(value, np.float64))
    return float(arr)
