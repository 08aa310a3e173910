"""Test config: run everything on a virtual 8-device CPU mesh so DP/TP/pjit
paths are testable without TPU hardware."""

import os

# MVLT_TPU_TESTS=1 opts into the real-TPU parity module
# (tests/test_tpu_parity.py — run it alone); everything else runs on the
# virtual 8-device CPU mesh.
_ON_CHIP = bool(os.environ.get("MVLT_TPU_TESTS"))

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"  # driver env may preset a TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have registered a TPU plugin and latched JAX_PLATFORMS
# before this conftest ran; override at the config level too.
import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REFERENCE_ROOT = "/root/reference"
# Tokenization is self-contained: the package vendors vocab.txt
# (mvlt_tpu/text/vocab.txt), so no MVLT_DEV_VOCAB_ROOT is needed here.

# Build the native C++ library up front so tests that exercise the fast
# paths (metrics PTB tokenizer, WordPiece) see it regardless of test order.
_REPO = pathlib.Path(__file__).resolve().parents[1]
if not (_REPO / "mvlt_tpu" / "_native" / "libmvlt_native.so").exists():
    import subprocess

    subprocess.run(["make", "-C", str(_REPO / "csrc")], check=False)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


# Fast high-signal modules (~2 min total on CPU): `pytest -m quick`.
# The full suite (~30 min) stays the default / nightly tier.
_QUICK_MODULES = {
    "test_config", "test_tokenizer", "test_native", "test_preprocess",
    "test_data", "test_sources", "test_metrics", "test_beam_scorer",
    "test_adapter", "test_heads", "test_fusion", "test_checkpoint",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
