"""Multi-host wiring: process-group init + host synchronization.

TPU-native replacement for the reference's NCCL-era helpers — Lightning DDP
env plumbing plus the hand-rolled barrier/broadcast wrappers
(/root/reference/threestudio_dreammat/threestudio/utils/misc.py:104-120) and
the rank-0 cache-fill + barrier pattern
(threestudio/models/prompt_processors/base.py:364-416). In JAX the data
plane needs no wrapper (XLA collectives ride ICI/DCN inside jit); what's
left is the control plane: one-time ``jax.distributed.initialize`` and
host-level sync around shared filesystem artifacts (prerender caches,
prompt-embedding caches, checkpoints).

Activation (any of):
- ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
  set explicitly — e.g. one process per host of a v5e pod slice;
- ``DREAMMAT_MULTIHOST=1`` — auto-detect from the cluster environment
  (Cloud TPU pod metadata / SLURM), per jax.distributed.initialize().

Single-host runs skip initialization entirely and every helper degrades to
a no-op, so the same entry points work from a laptop to a pod.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def maybe_initialize() -> tuple[int, int]:
    """Initialize jax.distributed iff the environment asks for it.
    Idempotent. Returns (process_index, process_count)."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_index(), jax.process_count()

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        if coord and nproc:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid or 0),
            )
            _initialized = True
        elif os.environ.get("DREAMMAT_MULTIHOST") == "1":
            jax.distributed.initialize()  # cluster auto-detection
            _initialized = True
    except RuntimeError:
        # already initialized by an embedding application
        _initialized = True
    return jax.process_index(), jax.process_count()


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_rank_zero() -> bool:
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Block until every host reaches this point (reference misc.py:104-111
    ``barrier()``). No-op on single host."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def rank_zero_fill(path: str, fill_fn, name: str = "cache"):
    """The reference's rank-0 cache pattern (prompt_processors/base.py:
    364-416): rank 0 produces a filesystem artifact, everyone barriers,
    then all ranks read it. ``fill_fn()`` runs only on rank 0 and only if
    ``path`` does not already exist. Returns whether the artifact exists."""
    if is_rank_zero() and not os.path.exists(path):
        fill_fn()
    barrier(f"rank_zero_fill:{name}")
    return os.path.exists(path)
