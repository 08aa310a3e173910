"""Flagship-GEOMETRY multi-chip lowering (VERDICT r3 next #7).

The driver's tiny-config dryrun proves the sharded step *executes*, but
real-shape partitioning bugs (Megatron rule coverage over every flagship
param, GSPMD propagation through the full Swin-S + BERT-base
fwd+bwd+AdamW graph) only surface when the REAL shapes are partitioned.
This AOT-compiles (no execution, abstract inputs) the flagship pretrain
step over the virtual 8-device mesh for BOTH partitioning modes:
DP-only shard_map and DP x TP GSPMD.
"""

import jax
import pytest


@pytest.mark.slow
def test_flagship_geometry_lowers_on_8_device_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    from mvlt_tpu.flagship import lower_flagship_multichip
    lower_flagship_multichip(8)   # raises on any partitioning failure


@pytest.mark.slow
def test_flagship_geometry_executes_on_8_device_mesh():
    """EXECUTE one real-shape DP step at b8 (VERDICT r4 item 5): catches
    runtime-only sharding failures (sharded AdamW numerics, collective
    layouts, donation) that the AOT compile above cannot."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    from mvlt_tpu.flagship import execute_flagship_multichip
    loss = execute_flagship_multichip(8, batch=8)
    # MLM+ITM loss at near-random params: positive, sane magnitude
    assert 0.0 < loss < 50.0, loss
