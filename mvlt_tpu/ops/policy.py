"""Trace-time kernel policy.

Mosaic (Pallas TPU) kernels cannot be automatically partitioned by
GSPMD: a ``pallas_call`` traced into a jit that spans more than one
device raises ``NotImplementedError`` at lowering unless the call is
wrapped in ``shard_map`` (see jax/_src/tpu_custom_call.py, the
SPMDAxisContext/ShardingContext checks).

The meshed train-step builders flip this flag while tracing a program
whose partitioning is delegated to GSPMD, so the encoder/backbone
kernel gates fall back to the XLA formulations there.  shard_map-
wrapped steps run with fully-manual mesh axes — Mosaic allows those —
and leave the flag off, keeping the fused kernels.
"""

from __future__ import annotations

import contextlib

_gspmd_auto_partition = False


def gspmd_auto_partition() -> bool:
    """True while tracing a multi-device GSPMD-partitioned program."""
    return _gspmd_auto_partition


@contextlib.contextmanager
def gspmd_tracing(on: bool = True):
    global _gspmd_auto_partition
    prev = _gspmd_auto_partition
    _gspmd_auto_partition = bool(on)
    try:
        yield
    finally:
        _gspmd_auto_partition = prev


def tpu_native_ok() -> bool:
    """Native Mosaic kernels are usable here: TPU backend AND not inside
    a GSPMD-auto-partitioned multi-device trace."""
    import jax
    return jax.default_backend() == "tpu" and not gspmd_auto_partition()
