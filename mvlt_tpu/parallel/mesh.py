"""Device-mesh construction for SPMD execution.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3: no
DDP, no NCCL, no torch.distributed import anywhere). Parallelism is new
capability in this framework: an explicit ``jax.sharding.Mesh`` with a
``data`` axis (DP gradient reduction over ICI via psum emitted by pjit) and
a ``model`` axis (Megatron-style tensor parallelism of the fusion encoder).

Multi-host: call :func:`initialize_distributed` once per process before
:func:`build_mesh`; ``jax.devices()`` then spans all hosts and mesh axes are
laid out so that ``model`` stays within a host's ICI domain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from mvlt_tpu.config import MeshConfig


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op when single-process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def build_mesh(config: MeshConfig = MeshConfig(),
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.

    ``model_parallel`` devices are adjacent (same ICI neighborhood under the
    default device order), so TP collectives ride ICI; the data axis spans
    the rest.  ``data_parallel == -1`` takes all remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, config.model_parallel)
    if len(devices) % mp != 0:
        raise ValueError(
            f"model_parallel={mp} does not divide device count {len(devices)}")
    dp = len(devices) // mp
    if config.data_parallel not in (-1, dp):
        raise ValueError(
            f"data_parallel={config.data_parallel} inconsistent with "
            f"{len(devices)} devices / model_parallel={mp}")
    grid = np.asarray(devices).reshape(dp, mp)
    return Mesh(grid, (config.data_axis, config.model_axis))
