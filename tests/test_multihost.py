"""Multi-host smoke test: 2-process ``jax.distributed`` CPU integration
covering ``initialize_distributed``, mesh construction over all hosts'
devices, per-host loader sharding, and one sharded DP x TP train step on
global arrays (VERDICT r1 item 7 — the multi-host path was written but
never executed)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MVLT_REPO"])

import numpy as np

from mvlt_tpu.config import MeshConfig
from mvlt_tpu.parallel.mesh import build_mesh, initialize_distributed

pid = int(os.environ["MVLT_PROC_ID"])
initialize_distributed(coordinator=os.environ["MVLT_COORD"],
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert jax.local_device_count() == 2
assert jax.device_count() == 4

# mesh over ALL hosts' devices: 2 (data) x 2 (model)
mesh = build_mesh(MeshConfig(model_parallel=2))
assert mesh.devices.shape == (2, 2)

# per-host loader sharding: strided slices must be disjoint and cover
from mvlt_tpu.data.loader import DataLoader

class _DS:
    def __len__(self):
        return 8
    def __getitem__(self, i, epoch=0):
        return {"x": np.full((2,), i, np.float32)}

loader = DataLoader(_DS(), batch_size=2, shuffle=False,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
mine = sorted(int(b["x"][j, 0]) for b in loader.epoch(0) for j in range(2))
assert len(mine) == 4
assert all(i % 2 == pid for i in mine), (pid, mine)

# one sharded train step on tiny shapes with GLOBAL batch arrays
from jax.sharding import NamedSharding, PartitionSpec as P

from mvlt_tpu.flagship import tiny_pretrain_config
from mvlt_tpu.models.heads import PretrainModel
from mvlt_tpu.train import (create_train_state, make_optimizer,
                            make_pretrain_step, shard_train_state)

cfg = tiny_pretrain_config()
model = PretrainModel(cfg)
B, L = 4, 8
rng = np.random.default_rng(0)   # identical on both hosts
full = {
    "image": rng.normal(size=(B, 3, 32, 32)).astype(np.float32),
    "caption_masked": rng.integers(1, 400, (B, L)).astype(np.int32),
    "caption_label": np.where(rng.random((B, L)) < 0.2,
                              rng.integers(1, 400, (B, L)), -100
                              ).astype(np.int32),
    "itm_label": rng.integers(0, 2, (B,)).astype(np.int32),
}
shapes = jax.eval_shape(lambda: model.init(
    jax.random.PRNGKey(0), full["image"], full["caption_masked"],
    full["caption_label"], full["itm_label"]))
variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
state = create_train_state(model, variables, make_optimizer(cfg))
with mesh:
    state, shardings = shard_train_state(state, mesh)
    step = make_pretrain_step(model, seq2seq=False, mesh=mesh,
                              state_shardings=shardings)
    data_sharding = NamedSharding(mesh, P("data"))
    # each host contributes its local half of the global batch
    local = {k: v[pid * (B // 2):(pid + 1) * (B // 2)]
             for k, v in full.items()}
    batch = {k: jax.make_array_from_process_local_data(
        data_sharding, v, (B,) + v.shape[1:])
        for k, v in local.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
assert int(state.step) == 1

if os.environ.get("MVLT_MH_FLAGSHIP") == "1":
    # FLAGSHIP-geometry lowering over the 2-host global mesh (VERDICT r4
    # item 5): the real Swin-S + BERT-base step must AOT-compile with the
    # production DP shardings when devices span processes.
    from mvlt_tpu.flagship import lower_flagship_multichip
    lower_flagship_multichip(4, mps=(1,))
    print(f"WORKER_{pid}_FLAGSHIP_OK")

print(f"WORKER_{pid}_OK loss={loss:.6f}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, extra_env=None, timeout=420):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "MVLT_REPO": REPO,
            "MVLT_PROC_ID": str(pid),
            "MVLT_COORD": f"127.0.0.1:{port}",
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out")
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    assert "WORKER_0_OK" in outs[0][1]
    assert "WORKER_1_OK" in outs[1][1]
    # both hosts computed the same global loss
    l0 = outs[0][1].split("loss=")[1].split()[0]
    l1 = outs[1][1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
    return outs


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    _run_workers(tmp_path)


@pytest.mark.slow
def test_two_process_flagship_lowering(tmp_path):
    """Flagship-geometry DP step AOT-compiles over the 2-host global mesh
    (VERDICT r4 item 5 — the multihost smoke was tiny-geometry only)."""
    outs = _run_workers(tmp_path, extra_env={"MVLT_MH_FLAGSHIP": "1"},
                        timeout=1500)
    assert "WORKER_0_FLAGSHIP_OK" in outs[0][1]
    assert "WORKER_1_FLAGSHIP_OK" in outs[1][1]
