"""VisualAdapter (Conv_layer equivalent): backbone dispatch, two-view
stacking, flatten + GELU + 2048→hidden projection
(reference ``modules/model.py:186-266``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import MVLTConfig, ResNetConfig, SwinConfig, ViTConfig
from mvlt_tpu.models.backbones.adapter import VisualAdapter


def tiny_cfg(conv: str) -> MVLTConfig:
    return MVLTConfig(
        conv=conv,
        swin=SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(1, 1),
                        num_heads=(2, 4), window_size=4, drop_path_rate=0.0),
        resnet=ResNetConfig(layers=(1, 1), width=8),
        vit=ViTConfig(image_size=32, patch_size=8, num_layers=1, num_heads=2,
                      hidden_dim=16, mlp_dim=32),
    )


@pytest.mark.parametrize("conv,img,expect_tokens", [
    ("linear", (2, 3, 32, 32), 4),        # 32/16=2 → 4 tokens
    ("swin", (2, 3, 32, 32), 16),         # 32/4/2 = 4 → 16 tokens
    ("resnet50", (2, 3, 32, 32), 16),     # stem/2·pool/2·stage1/2 → 4² tokens
    ("vit", (2, 3, 32, 32), 16),          # 32/8 = 4 → 16 tokens
])
def test_adapter_dispatch_and_shapes(conv, img, expect_tokens):
    cfg = tiny_cfg(conv)
    adapter = VisualAdapter(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=img).astype(np.float32))
    variables = adapter.init(jax.random.PRNGKey(0), x)
    out = adapter.apply(variables, x)
    assert out.shape == (2, expect_tokens, cfg.fusion.hidden_size)


def test_adapter_two_view_concat():
    """5-D IU X-Ray input (B, 2, C, H, W) → per-view tokens concatenated
    (reference model.py:240-253)."""
    cfg = tiny_cfg("swin")
    adapter = VisualAdapter(cfg)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(2, 2, 3, 32, 32)).astype(np.float32))
    variables = adapter.init(jax.random.PRNGKey(0), v)
    out = adapter.apply(variables, v)
    assert out.shape == (2, 32, cfg.fusion.hidden_size)

    # each half equals the single-view encoding
    one = adapter.apply(variables, v[:, 0])
    np.testing.assert_allclose(np.asarray(out[:, :16]), np.asarray(one),
                               atol=1e-6)
    two = adapter.apply(variables, v[:, 1])
    np.testing.assert_allclose(np.asarray(out[:, 16:]), np.asarray(two),
                               atol=1e-6)


def test_adapter_projects_2048_channels():
    """ResNet features (2048-d at full width) must pass through resnet_fc
    (reference model.py:263-264). With the tiny resnet, num_features=256,
    which still != hidden → projection applies."""
    cfg = tiny_cfg("resnet50")
    adapter = VisualAdapter(cfg)
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    variables = adapter.init(jax.random.PRNGKey(0), x)
    assert "resnet_fc" in variables["params"]


def test_uint8_device_normalize_matches_host_chain():
    """The device-normalize path (uint8 HWC in, float/transpose/var-norm
    inside the model) must match the host numpy chain
    (``transforms.normalize_image_var``) through the full adapter."""
    from mvlt_tpu.data.transforms import normalize_image_var
    from mvlt_tpu.models.backbones.adapter import device_var_normalize

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    host = np.stack([normalize_image_var(
        im.astype(np.float32).transpose(2, 0, 1)) for im in u8])
    dev = np.asarray(device_var_normalize(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-6)

    # through the adapter: uint8 input == pre-normalized f32 input
    cfg = tiny_cfg("swin")
    adapter = VisualAdapter(cfg)
    variables = adapter.init(jax.random.PRNGKey(0), jnp.asarray(host))
    out_f32 = adapter.apply(variables, jnp.asarray(host))
    out_u8 = adapter.apply(variables, jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f32),
                               rtol=1e-4, atol=1e-5)

    # two-view uint8 (B, 2, H, W, 3)
    u8_2v = rng.integers(0, 256, size=(2, 2, 32, 32, 3), dtype=np.uint8)
    host_2v = np.stack([np.stack([normalize_image_var(
        im.astype(np.float32).transpose(2, 0, 1)) for im in views])
        for views in u8_2v])
    out2_f32 = adapter.apply(variables, jnp.asarray(host_2v))
    out2_u8 = adapter.apply(variables, jnp.asarray(u8_2v))
    np.testing.assert_allclose(np.asarray(out2_u8), np.asarray(out2_f32),
                               rtol=1e-4, atol=1e-5)
