"""Checkpoint / resume.

One mechanism (the reference had two inconsistent ones: HF
``save_pretrained`` dirs and whole-module ``torch.save`` pickles, and it
never saved optimizer state — SURVEY.md §5):

- :func:`save_checkpoint` / :func:`restore_checkpoint`: full TrainState
  (params, optimizer moments, step, batch stats) via Orbax — sharded-array
  aware, multi-host safe.
- :func:`save_pretrained` / :func:`load_pretrained`: model-only export
  (params + config.json), the interchange format for finetuning from a
  pretrain run (parity with ``model.save_pretrained`` usage,
  ``run_pretrain.py:190-192``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from mvlt_tpu.config import MVLTConfig


def _checkpointer():
    return ocp.PyTreeCheckpointer()


_ASYNC: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    # one module-level instance: it owns the background serialization
    # thread, and reusing it serializes saves (wait before each new one)
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint save has been committed
    to storage.  No-op if none is pending."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    keep: int = 3, async_save: bool = False) -> str:
    """Save a TrainState under ``path/step_<n>`` and prune old steps.

    ``async_save=True`` returns right after the device->host snapshot
    (training resumes while Orbax serializes on a background thread —
    the reference's ``torch.save`` blocks the loop for the full write).
    Only one async save is in flight at a time: the next call (or
    :func:`wait_for_async_saves` / :func:`latest_checkpoint`) waits for
    the previous one first, so up to ``keep``+1 step dirs may exist
    transiently."""
    step = int(state.step) if step is None else int(step)
    target = os.path.join(os.path.abspath(path), f"step_{step:08d}")
    # split off non-pytree fields (tx/apply_fn are static)
    payload = {"step": state.step, "params": state.params,
               "opt_state": state.opt_state,
               "extra_variables": state.extra_variables}
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()
        _prune(path, keep)              # account for the save that just landed
        ckptr.save(target, payload, force=True)
    else:
        _checkpointer().save(target, payload, force=True)
        _prune(path, keep)
    return target


def latest_checkpoint(path: str) -> Optional[str]:
    wait_for_async_saves()          # an in-flight save must be visible
    if not os.path.isdir(path):
        return None
    # skip orbax step_N.orbax-checkpoint-tmp-<ts> leftovers from an
    # interrupted save: restoring one raises, and counting them
    # toward keep silently prunes real checkpoints
    steps = sorted(d for d in os.listdir(path)
                   if d.startswith("step_") and "-tmp-" not in d)
    # orbax requires absolute paths (tensorstore kvstore spec)
    return os.path.join(os.path.abspath(path), steps[-1]) if steps else None


def restore_checkpoint(path: str, state: Any) -> Tuple[Any, bool]:
    """Restore into the (already-built, possibly sharded) state. Returns
    (state, restored?)."""
    target = latest_checkpoint(path) if not os.path.basename(path).startswith(
        "step_") else os.path.abspath(path)   # orbax needs absolute paths
    if target is None:
        return state, False
    template = {"step": state.step, "params": state.params,
                "opt_state": state.opt_state,
                "extra_variables": state.extra_variables}
    restored = _checkpointer().restore(target, item=template)
    return state.replace(**restored), True


def _prune(path: str, keep: int) -> None:
    if not os.path.isdir(path):
        return
    # skip orbax step_N.orbax-checkpoint-tmp-<ts> leftovers from an
    # interrupted save: restoring one raises, and counting them
    # toward keep silently prunes real checkpoints
    steps = sorted(d for d in os.listdir(path)
                   if d.startswith("step_") and "-tmp-" not in d)
    for d in steps[:-keep] if keep > 0 else []:
        import shutil
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)


# ---------------------------------------------------------------------------
# model-only export (pretrain -> finetune interchange)
# ---------------------------------------------------------------------------

def save_pretrained(path: str, config: MVLTConfig, variables: Any) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(config.to_json())
    _checkpointer().save(os.path.join(os.path.abspath(path), "variables"),
                         jax.tree.map(np.asarray, variables), force=True)


def load_pretrained(path: str) -> Tuple[MVLTConfig, Any]:
    with open(os.path.join(path, "config.json")) as f:
        config = MVLTConfig.from_json(f.read())
    variables = _checkpointer().restore(
        os.path.join(os.path.abspath(path), "variables"))
    return config, variables
