"""Swin backbone: unit tests + golden-value parity vs HF ``SwinModel``
(the same Microsoft architecture the reference vendors at
``modules/visual_feature_extractor.py:113-702``; timm/torchvision are not
installed, so HF transformers is the executable golden reference)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import SwinConfig, swin_small
from mvlt_tpu.models.backbones.swin import (
    SwinTransformer, relative_position_index, shifted_window_mask,
    window_partition, window_reverse)
from mvlt_tpu.utils import convert


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 5)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_reference_formula():
    # reference visual_feature_extractor.py:204-214, window 3x3
    wh = ww = 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    expected = rel.sum(-1)
    np.testing.assert_array_equal(relative_position_index(3, 3), expected)
    # diagonal = self-relative position = centre of the (2w-1)^2 table
    assert np.all(np.diag(relative_position_index(3, 3)) == expected[0, 0])


def test_shifted_window_mask_structure():
    # 8x8 map, window 4, shift 2 → 4 windows, N=16
    mask = shifted_window_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # window 0 (top-left) has no wrapped content → all-zero mask
    np.testing.assert_array_equal(mask[0], 0.0)
    # wrapped windows must contain -100 blocks
    assert (mask[1] == -100.0).any()
    assert (mask[3] == -100.0).any()
    # mask is symmetric in "same region" structure
    np.testing.assert_array_equal(mask[3], mask[3].transpose(0, 2, 1).squeeze()
                                  if mask[3].ndim == 3 else mask[3].T)


@pytest.fixture(scope="module")
def hf_swin_pair():
    torch = pytest.importorskip("torch")
    from transformers import SwinConfig as HFSwinConfig
    from transformers import SwinModel

    hf_cfg = HFSwinConfig(
        image_size=32, patch_size=4, num_channels=3, embed_dim=8,
        depths=[2, 2], num_heads=[2, 4], window_size=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, use_absolute_embeddings=False)
    torch.manual_seed(0)
    hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 4), window_size=4, drop_path_rate=0.0)
    return hf, cfg


def test_swin_parity_with_hf(hf_swin_pair):
    import torch

    hf, cfg = hf_swin_pair
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.from_numpy(img)).last_hidden_state.numpy()

    sd = convert.state_dict_to_numpy(hf.state_dict())
    params = convert.swin_from_hf(sd, cfg.depths)
    model = SwinTransformer(cfg)
    got = model.apply({"params": params}, jnp.asarray(img))
    got = np.asarray(got)

    assert got.shape == want.shape == (2, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_swin_small_shapes_and_param_count():
    """Swin-S @224 → (B, 49, 768); ~48.8M backbone params (no head)."""
    cfg = swin_small()
    model = SwinTransformer(cfg)
    img = jnp.zeros((1, 3, 224, 224), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img))["params"]
    out = jax.eval_shape(lambda p: model.apply({"params": p}, img), params)
    assert out.shape == (1, 49, 768)
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert 48e6 < n < 50e6


def test_swin_remat_matches_plain(hf_swin_pair):
    _, cfg = hf_swin_pair
    img = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 3, 32, 32)).astype(np.float32))
    model = SwinTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    plain = model.apply({"params": params}, img)
    remat = SwinTransformer(cfg, remat=True).apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(remat),
                               atol=1e-6, rtol=1e-6)


def test_swin_official_checkpoint_layout_roundtrip(hf_swin_pair):
    """swin_from_torch (fused-qkv official .pth layout) must agree with
    swin_from_hf on the same underlying weights."""
    import torch

    hf, cfg = hf_swin_pair
    sd = convert.state_dict_to_numpy(hf.state_dict())
    params_hf = convert.swin_from_hf(sd, cfg.depths)

    # build an official-layout dict from the HF one
    official = {
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "patch_embed.norm.weight": sd["embeddings.norm.weight"],
        "patch_embed.norm.bias": sd["embeddings.norm.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            hp = f"encoder.layers.{i}.blocks.{j}."
            op = f"layers.{i}.blocks.{j}."
            official[op + "norm1.weight"] = sd[hp + "layernorm_before.weight"]
            official[op + "norm1.bias"] = sd[hp + "layernorm_before.bias"]
            official[op + "norm2.weight"] = sd[hp + "layernorm_after.weight"]
            official[op + "norm2.bias"] = sd[hp + "layernorm_after.bias"]
            official[op + "attn.qkv.weight"] = np.concatenate(
                [sd[hp + f"attention.self.{n}.weight"] for n in ("query", "key", "value")], 0)
            official[op + "attn.qkv.bias"] = np.concatenate(
                [sd[hp + f"attention.self.{n}.bias"] for n in ("query", "key", "value")], 0)
            official[op + "attn.proj.weight"] = sd[hp + "attention.output.dense.weight"]
            official[op + "attn.proj.bias"] = sd[hp + "attention.output.dense.bias"]
            official[op + "attn.relative_position_bias_table"] = \
                sd[hp + "attention.self.relative_position_bias_table"]
            official[op + "mlp.fc1.weight"] = sd[hp + "intermediate.dense.weight"]
            official[op + "mlp.fc1.bias"] = sd[hp + "intermediate.dense.bias"]
            official[op + "mlp.fc2.weight"] = sd[hp + "output.dense.weight"]
            official[op + "mlp.fc2.bias"] = sd[hp + "output.dense.bias"]
        dk = f"encoder.layers.{i}.downsample.reduction.weight"
        if dk in sd:
            official[f"layers.{i}.downsample.reduction.weight"] = sd[dk]
            official[f"layers.{i}.downsample.norm.weight"] = \
                sd[f"encoder.layers.{i}.downsample.norm.weight"]
            official[f"layers.{i}.downsample.norm.bias"] = \
                sd[f"encoder.layers.{i}.downsample.norm.bias"]

    params_official = convert.swin_from_torch(official, cfg.depths)
    flat_hf = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_flatten_with_path(params_hf)[0]}
    flat_official = {jax.tree_util.keystr(p): v for p, v in
                     jax.tree_util.tree_flatten_with_path(params_official)[0]}
    assert flat_hf.keys() == flat_official.keys()
    for k in flat_hf:
        np.testing.assert_array_equal(flat_hf[k], flat_official[k])


@pytest.mark.skipif(not os.environ.get("MVLT_SLOW_TESTS"),
                    reason="full-size parity is slow; set MVLT_SLOW_TESTS=1")
def test_swin_small_full_size_parity_with_hf():
    """Real Swin-S config (224px, window 7, shift 3, depths 2/2/18/2):
    numeric parity vs HF SwinModel with random weights."""
    import torch
    from transformers import SwinConfig as HFSwinConfig
    from transformers import SwinModel

    hf_cfg = HFSwinConfig(
        image_size=224, patch_size=4, num_channels=3, embed_dim=96,
        depths=[2, 2, 18, 2], num_heads=[3, 6, 12, 24], window_size=7,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, use_absolute_embeddings=False)
    torch.manual_seed(0)
    hf = SwinModel(hf_cfg, add_pooling_layer=False).eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(img)).last_hidden_state.numpy()

    cfg = swin_small()
    params = convert.swin_from_hf(
        convert.state_dict_to_numpy(hf.state_dict()), cfg.depths)
    got = SwinTransformer(cfg).apply({"params": params}, jnp.asarray(img))
    assert got.shape == want.shape == (1, 49, 768)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
