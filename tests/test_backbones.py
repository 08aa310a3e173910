"""ResNet / ViT backbones: golden-value parity vs HF transformers models
(architecture-identical to the torchvision models the reference wraps,
``modules/visual_feature_extractor.py:7-107``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import ResNetConfig, ViTConfig
from mvlt_tpu.models.backbones.resnet import ResNet
from mvlt_tpu.models.backbones.vit import ViT
from mvlt_tpu.utils import convert

torch = pytest.importorskip("torch")


def test_resnet_parity_with_hf():
    from transformers import ResNetConfig as HFResNetConfig
    from transformers import ResNetModel

    # tiny bottleneck resnet: depths (1, 1), widths 8 -> (32, 64)
    hf_cfg = HFResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=[32, 64],
        depths=[1, 1], layer_type="bottleneck",
        downsample_in_first_stage=False, downsample_in_bottleneck=False)
    torch.manual_seed(0)
    hf = ResNetModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(img)).last_hidden_state.numpy()  # (B,C,h,w)
    B, C, h, w = want.shape
    want = want.reshape(B, C, h * w).transpose(0, 2, 1)             # (B,N,C)

    cfg = ResNetConfig(layers=(1, 1), width=8)
    variables = convert.resnet_from_hf(
        convert.state_dict_to_numpy(hf.state_dict()), cfg.layers)
    got = ResNet(cfg).apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_resnet50_output_shape():
    cfg = ResNetConfig(layers=(3, 4, 6, 3), width=64)
    model = ResNet(cfg)
    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), img))
    out = jax.eval_shape(
        lambda v: model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]}, img),
        variables)
    assert out.shape == (1, 49, 2048)


def test_vit_parity_with_hf():
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTModel

    hf_cfg = HFViTConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6)  # torchvision ViT uses eps 1e-6
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # reference drops the class token (visual_feature_extractor.py:107)
        want = hf(torch.from_numpy(img)).last_hidden_state[:, 1:].numpy()

    cfg = ViTConfig(image_size=32, patch_size=8, num_layers=2, num_heads=2,
                    hidden_dim=16, mlp_dim=32)
    params = convert.vit_from_hf(
        convert.state_dict_to_numpy(hf.state_dict()),
        cfg.num_layers, cfg.num_heads)
    got = ViT(cfg).apply({"params": params},
                         jnp.asarray(img.transpose(0, 2, 3, 1)))
    assert got.shape == want.shape == (2, 16, 16)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
