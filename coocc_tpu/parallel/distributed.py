"""Multi-host initialization + cross-process metric reduction.

Replaces the reference's torch.distributed.launch / NCCL env plumbing
(tools/dist_train.sh:1-17 NNODES/NODE_RANK/MASTER_ADDR) and its
filesystem-pickle result gather (collect_results_cpu, apis/utils.py:185-237):
jax.distributed.initialize wires every host into one global mesh over
ICI/DCN, and small metric arrays cross hosts with
multihost_utils.process_allgather — no tmpdir rendezvous.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when launched across hosts.

    Reads JAX_COORDINATOR / NUM_PROCESSES / PROCESS_ID env vars when args
    are not given (the TPU pod runtime usually auto-detects and none of
    this is needed). Returns True when multi-host is active.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    process_id = process_id if process_id is not None \
        else int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def allgather_metrics(local_hist: np.ndarray) -> np.ndarray:
    """Sum a per-process confusion matrix across processes.

    TPU-native replacement for dist.all_reduce(SUM) of metric tensors
    (apis/test.py:242-243).
    """
    if jax.process_count() == 1:
        return local_hist
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(local_hist)
    return np.asarray(gathered).sum(axis=0)


def is_main_process() -> bool:
    return jax.process_index() == 0
