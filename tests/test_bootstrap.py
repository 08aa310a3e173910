"""--backbone_ckpt bootstrap: official-layout checkpoints load into a
fresh model (reference auto-load behavior, ``modules/model.py:222-226``,
as an explicit driver flag)."""

import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

torch = pytest.importorskip("torch")

from mvlt_tpu.config import (FusionConfig, MVLTConfig,  # noqa: E402
                             SwinConfig)
from mvlt_tpu.models.heads import VQAModel  # noqa: E402
from mvlt_tpu.utils.bootstrap import load_backbone  # noqa: E402

TINY_SWIN = SwinConfig(img_size=32, patch_size=4, embed_dim=16,
                       depths=(1, 1), num_heads=(2, 4), window_size=4,
                       drop_path_rate=0.0)


def _tiny_cfg():
    return MVLTConfig(
        fusion=FusionConfig(vocab_size=64, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64),
        conv="swin", swin=TINY_SWIN, result_num=4,
        cls_token_id=3, sep_token_id=4, eos_token_id=5, mask_token_id=6)


def _leaves(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_official_swin_pth_bootstrap(tmp_path):
    """A {'model': sd} .pth in the official MSFT layout (what the
    reference loads) flows through load_backbone into a fresh VQAModel:
    backbone params replaced, everything else untouched."""
    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import load_reference
    load_reference()
    import modules.visual_feature_extractor as vfe

    torch.manual_seed(11)
    ref_swin = vfe.SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=[1, 1], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        ape=False, patch_norm=True).eval()
    path = str(tmp_path / "swin_tiny.pth")
    torch.save({"model": ref_swin.state_dict()}, path)

    cfg = _tiny_cfg()
    tree = load_backbone(path, cfg)
    assert set(tree) == {"params"}
    got = _leaves(tree["params"]["conv"]["backbone"])
    want_kernel = ref_swin.state_dict()["patch_embed.proj.weight"]
    key = [k for k in got if "patch_embed" in k and "kernel" in k][0]
    assert got[key].size == want_kernel.numel()

    # merge into a fresh model via the runner path
    from mvlt_tpu.tasks.common import _merge_pretrained
    import logging
    model = VQAModel(cfg)
    img = jnp.zeros((1, 3, 32, 32), jnp.float32)
    q = jnp.ones((1, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, q)
    merged = _merge_pretrained(variables, tree, logging.getLogger("t"))
    mleaves = _leaves(merged["params"]["conv"]["backbone"])
    for k, v in got.items():
        np.testing.assert_array_equal(mleaves[k], v)
    # non-backbone params untouched
    np.testing.assert_array_equal(
        _leaves(merged["params"]["fusion"])["['word_embeddings']['embedding']"],
        _leaves(variables["params"]["fusion"])["['word_embeddings']['embedding']"])
    # merged model still runs
    prob, logits = model.apply(merged, img, q, deterministic=True)
    assert logits.shape == (1, 4)


def test_hf_swin_layout_autodetected(tmp_path):
    """HF SwinModel state dicts (separate q/k/v keys) are detected and
    converted through swin_from_hf."""
    from transformers import SwinConfig as HFSwinConfig
    from transformers import SwinModel

    hf_cfg = HFSwinConfig(image_size=32, patch_size=4, embed_dim=16,
                          depths=[1, 1], num_heads=[2, 4], window_size=4,
                          drop_path_rate=0.0)
    torch.manual_seed(12)
    hf = SwinModel(hf_cfg).eval()
    path = str(tmp_path / "swin_hf.pth")
    torch.save(hf.state_dict(), path)

    cfg = _tiny_cfg()
    tree = load_backbone(path, cfg)
    from mvlt_tpu.models.backbones.swin import SwinTransformer
    ours = SwinTransformer(cfg.swin)
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    out = ours.apply({"params": tree["params"]["conv"]["backbone"]},
                     jnp.asarray(x), deterministic=True)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_vqa_driver_backbone_ckpt_flag(tmp_path):
    """run_vqa.py --backbone_ckpt drives end-to-end (synthetic tiny run)."""
    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import load_reference
    load_reference()
    import modules.visual_feature_extractor as vfe

    torch.manual_seed(13)
    ref_swin = vfe.SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=[1, 1], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        ape=False, patch_norm=True).eval()
    path = str(tmp_path / "swin_tiny.pth")
    torch.save({"model": ref_swin.state_dict()}, path)

    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "run_vqa.py", "--synthetic", "--tiny",
         "--epochs", "1", "--batch_size", "8", "--backbone_ckpt", path,
         "--model_name", str(tmp_path / "out")],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
