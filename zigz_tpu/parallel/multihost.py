"""Multi-host orchestration: jax.distributed bring-up + failure policy.

The reference is single-process (SURVEY.md §2.11); this module is the
DCN-facing piece of the new distributed layer.  Design:

* every host calls :func:`initialize` (coordinator address via env or
  argument), then builds the SAME global trace mesh over all devices;
* host-side control flow (VM execution, transcript, challenge schedule)
  is pure and deterministic given (program, input, seed), so each host
  replicates it locally — only psum/collective-permute traffic crosses
  ICI/DCN, never control decisions;
* failure policy is fail-fast + deterministic restart: proof generation
  is a pure function, so a lost host aborts the job and the coordinator
  relaunches; no partial-state checkpointing is needed for correctness
  (the de-facto resume story the reference also relies on — same seed,
  same proof bytes).  The mechanism lives in :mod:`recovery`
  (heartbeat failure detection, kill-by-PID, restart, and an enforced
  byte-identical-restart invariant; tests/test_recovery.py).

Single-host processes (the common case on this machine) can use
:func:`global_trace_mesh` directly without ``initialize``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "global_trace_mesh", "is_coordinator", "sync_hosts"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up (idempotent).  Arguments default to the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.) or single-process
    operation when none are set."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def global_trace_mesh() -> Mesh:
    """1-D mesh over ALL devices of the job (every host must call this with
    the same device order — jax.devices() is globally consistent)."""
    return Mesh(np.array(jax.devices()), ("trace",))


def is_coordinator() -> bool:
    return jax.process_index() == 0


def sync_hosts(tag: str = "barrier") -> None:
    """Cross-host barrier (psum of a scalar over all devices)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
