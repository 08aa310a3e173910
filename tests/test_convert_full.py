"""Full reference-checkpoint converters: torchvision-layout ResNet parity
with the HF path, and task-level (MVLBertForX) state-dict mapping onto our
model trees (structure + shape exact, loaded weights verified where an
executable oracle exists)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import FusionConfig, MVLTConfig, ResNetConfig, SwinConfig
from mvlt_tpu.models.heads import (CaptionModel, PretrainModel,
                                   RetrievalModel, VQAModel)
from mvlt_tpu.utils import convert

torch = pytest.importorskip("torch")


def _hf_resnet_sd_as_torchvision(sd, layers):
    out = {
        "conv1.weight": sd["embedder.embedder.convolution.weight"],
        "bn1.weight": sd["embedder.embedder.normalization.weight"],
        "bn1.bias": sd["embedder.embedder.normalization.bias"],
        "bn1.running_mean": sd["embedder.embedder.normalization.running_mean"],
        "bn1.running_var": sd["embedder.embedder.normalization.running_var"],
    }
    for s, blocks in enumerate(layers):
        for b in range(blocks):
            hp = f"encoder.stages.{s}.layers.{b}."
            tp = f"layer{s + 1}.{b}."
            for c in (1, 2, 3):
                out[tp + f"conv{c}.weight"] = sd[hp + f"layer.{c - 1}.convolution.weight"]
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    out[tp + f"bn{c}.{stat}"] = sd[hp + f"layer.{c - 1}.normalization.{stat}"]
            if hp + "shortcut.convolution.weight" in sd:
                out[tp + "downsample.0.weight"] = sd[hp + "shortcut.convolution.weight"]
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    out[tp + f"downsample.1.{stat}"] = sd[hp + f"shortcut.normalization.{stat}"]
    return out


def test_resnet_torchvision_layout_matches_hf_layout():
    from transformers import ResNetConfig as HFResNetConfig
    from transformers import ResNetModel

    hf_cfg = HFResNetConfig(num_channels=3, embedding_size=8,
                            hidden_sizes=[32, 64], depths=[1, 1],
                            layer_type="bottleneck",
                            downsample_in_bottleneck=False)
    torch.manual_seed(0)
    hf = ResNetModel(hf_cfg).eval()
    sd = convert.state_dict_to_numpy(hf.state_dict())
    layers = (1, 1)

    via_hf = convert.resnet_from_hf(sd, layers)
    via_tv = convert.resnet_from_torchvision(
        _hf_resnet_sd_as_torchvision(sd, layers), layers)
    flat_a = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(via_hf)[0]}
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(via_tv)[0]}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


# ---------------------------------------------------------------------------
# task-level converters: build a reference-layout state dict from real HF
# torch modules (BertEncoder/BertOnlyMLMHead/etc.), convert, and check the
# tree matches our model's init exactly
# ---------------------------------------------------------------------------

def _reference_like_sd(fusion_cfg: FusionConfig, task: str, result_num=4):
    from transformers import ResNetConfig as HFResNetConfig
    from transformers import ResNetModel
    from transformers.models.bert.configuration_bert import BertConfig
    from transformers.models.bert.modeling_bert import (BertEncoder,
                                                        BertOnlyMLMHead,
                                                        BertPooler,
                                                        BertPredictionHeadTransform)

    bcfg = BertConfig(vocab_size=fusion_cfg.vocab_size,
                      hidden_size=fusion_cfg.hidden_size,
                      num_hidden_layers=fusion_cfg.num_hidden_layers,
                      num_attention_heads=fusion_cfg.num_attention_heads,
                      intermediate_size=fusion_cfg.intermediate_size,
                      max_position_embeddings=fusion_cfg.max_position_embeddings)
    bcfg._attn_implementation = "eager"
    torch.manual_seed(0)
    sd = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            sd[prefix + k] = v

    # Conv_layer with resnet50-layout backbone (tiny)
    hf_res = ResNetModel(HFResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=[32, 64],
        depths=[1, 1], layer_type="bottleneck",
        downsample_in_bottleneck=False)).eval()
    tv = _hf_resnet_sd_as_torchvision(
        convert.state_dict_to_numpy(hf_res.state_dict()), (1, 1))
    for k, v in tv.items():
        sd["conv.conv.0." + k] = torch.as_tensor(np.asarray(v))
    sd["conv.resnet_fc.weight"] = torch.randn(fusion_cfg.hidden_size, 64)
    sd["conv.resnet_fc.bias"] = torch.randn(fusion_cfg.hidden_size)

    # MVLBert
    sd["MVLBert.word_embeddings.weight"] = torch.randn(
        fusion_cfg.vocab_size + 1, fusion_cfg.hidden_size)
    sd["MVLBert.position_embeddings.weight"] = torch.randn(
        fusion_cfg.max_position_embeddings, fusion_cfg.hidden_size)
    sd["MVLBert.token_type_embeddings.weight"] = torch.randn(
        3, fusion_cfg.hidden_size)
    add("MVLBert.encoder.", BertEncoder(bcfg))
    add("MVLBert.pooler.", BertPooler(bcfg))

    if task == "vqa":
        sd["final_mlp.1.weight"] = torch.randn(result_num, fusion_cfg.hidden_size)
        sd["final_mlp.1.bias"] = torch.randn(result_num)
    elif task == "pretrain":
        add("MLM_head_seq2seq.", BertOnlyMLMHead(bcfg))
        add("MLM_head_bidir.", BertOnlyMLMHead(bcfg))
        sd["ITM_mlp.weight"] = torch.randn(2, fusion_cfg.hidden_size)
        sd["ITM_mlp.bias"] = torch.randn(2)
    elif task == "retrieval":
        add("final_mlp.0.", BertPredictionHeadTransform(bcfg))
        sd["final_mlp.1.weight"] = torch.randn(2, fusion_cfg.hidden_size)
        sd["final_mlp.1.bias"] = torch.randn(2)
    elif task == "caption":
        add("MLM_head_seq2seq.", BertOnlyMLMHead(bcfg))
    return convert.state_dict_to_numpy(sd)


FCFG = FusionConfig(hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    vocab_size=40, max_position_embeddings=64)
MCFG = MVLTConfig(conv="resnet50", fusion=FCFG,
                  resnet=ResNetConfig(layers=(1, 1), width=8), result_num=4,
                  cls_token_id=3, sep_token_id=4, eos_token_id=5,
                  mask_token_id=6)


@pytest.mark.parametrize("task,model_cls,converter,init_args", [
    ("vqa", VQAModel, convert.vqa_from_torch, "vqa"),
    ("pretrain", PretrainModel, convert.pretrain_from_torch, "pretrain"),
    ("retrieval", RetrievalModel, convert.retrieval_from_torch, "retr"),
    ("caption", CaptionModel, convert.caption_from_torch, "cap"),
])
def test_task_converter_tree_matches_model(task, model_cls, converter,
                                           init_args):
    sd = _reference_like_sd(FCFG, task)
    variables = converter(sd, num_layers=FCFG.num_hidden_layers,
                          conv="resnet50", layers=(1, 1))

    model = model_cls(MCFG)
    img = jnp.zeros((1, 3, 32, 32), jnp.float32)
    cap = jnp.ones((1, 4), jnp.int32)
    if task == "vqa":
        ref = model.init(jax.random.PRNGKey(0), img, cap)
    elif task == "pretrain":
        ref = model.init(jax.random.PRNGKey(0), img, cap,
                         jnp.full((1, 4), -100, jnp.int32),
                         jnp.zeros((1,), jnp.int32))
    elif task == "retrieval":
        ref = model.init(jax.random.PRNGKey(0), img, cap)
    else:
        ref = model.init(jax.random.PRNGKey(0), img, cap)

    flat_ref = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(ref)[0]}
    flat_got = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert flat_got.keys() == flat_ref.keys(), (
        sorted(set(flat_ref) - set(flat_got))[:5],
        sorted(set(flat_got) - set(flat_ref))[:5])
    for k in flat_ref:
        assert flat_got[k] == flat_ref[k], (k, flat_got[k], flat_ref[k])

    # converted weights must actually run
    variables = jax.tree.map(jnp.asarray, variables)
    if task == "vqa":
        prob, logits = model.apply(variables, img, cap)
        assert logits.shape == (1, 4)
    elif task == "retrieval":
        logits = model.apply(variables, img, cap)
        assert logits.shape == (1, 2)
