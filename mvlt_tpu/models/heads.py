"""Task heads + full task models (reference ``modules/model.py:297-546``).

Each task model = VisualAdapter backbone + FusionEncoder + head, exposing a
pure ``apply``-able forward.  Loss math mirrors the reference exactly:
cross entropy with ignore_index=-100 for MLM/VQA, plain CE for ITM.

The reference's per-batch Python coin flip between seq2seq and
bidirectional masks during pretraining (model.py:390-394) becomes an
explicit static ``seq2seq`` argument: the caller flips it with a logged,
keyed PRNG draw (see ``mvlt_tpu.train``), keeping the compiled step static.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mvlt_tpu.config import MVLTConfig
from mvlt_tpu.models.backbones import VisualAdapter
from mvlt_tpu.models.fusion import FusionEncoder
from mvlt_tpu.ops.layers import (cross_entropy_ignore_index,
                                  gather_label_positions, gelu_exact,
                                  normal_init)


class HeadTransform(nn.Module):
    """HF ``BertPredictionHeadTransform``: dense + gelu + LN."""

    hidden_size: int
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, kernel_init=normal_init(0.02),
                     dtype=self.dtype, name="transform_dense")(x)
        x = gelu_exact(x)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="transform_layernorm")(x)


class MLMHead(nn.Module):
    """HF ``BertOnlyMLMHead``: transform + decoder to vocab logits."""

    hidden_size: int
    vocab_size: int
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = HeadTransform(self.hidden_size, self.layer_norm_eps, self.dtype,
                          name="transform")(x)
        return nn.Dense(self.vocab_size, kernel_init=normal_init(0.02),
                        dtype=self.dtype, name="decoder")(x)


def _fusion(cfg: MVLTConfig, pooling: bool, dtype) -> FusionEncoder:
    return FusionEncoder(cfg.fusion, add_pooling_layer=pooling, dtype=dtype,
                         cls_token_id=cfg.cls_token_id,
                         sep_token_id=cfg.sep_token_id,
                         remat=cfg.remat_fusion, name="fusion")


class VQAModel(nn.Module):
    """``MVLBertForVQA`` (model.py:297-349): pooled [CLS] -> dropout -> linear."""

    config: MVLTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv = VisualAdapter(cfg, self.dtype, name="conv")
        self.fusion = _fusion(cfg, pooling=True, dtype=self.dtype)
        self.dropout = nn.Dropout(cfg.fusion.hidden_dropout_prob)
        self.final_mlp = nn.Dense(cfg.result_num, kernel_init=normal_init(0.02),
                                  dtype=self.dtype, name="final_mlp")

    def __call__(self, image, question, deterministic: bool = True):
        """image: (B,C,H,W); question: (B,L) padded ids. -> (prob, logits)."""
        feat = self.conv(image, deterministic)
        text_mask = question > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = self.fusion(question, text_mask, feat, image_mask,
                          deterministic=deterministic)
        pooled = self.dropout(out.pooled, deterministic=deterministic)
        logits = self.final_mlp(pooled)
        return jnp.asarray(nn.softmax(logits, axis=-1)), logits

    def loss(self, image, question, label, deterministic: bool = False,
             axis_name=None):
        _, logits = self(image, question, deterministic)
        return cross_entropy_ignore_index(logits, label,
                                          axis_name=axis_name), logits


class PretrainModel(nn.Module):
    """``MVLBertForPretraining`` (model.py:352-420): dual MLM heads + ITM."""

    config: MVLTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv = VisualAdapter(cfg, self.dtype, name="conv")
        self.fusion = _fusion(cfg, pooling=True, dtype=self.dtype)
        f = cfg.fusion
        self.mlm_head_seq2seq = MLMHead(f.hidden_size, f.vocab_size,
                                        f.layer_norm_eps, self.dtype,
                                        name="mlm_head_seq2seq")
        self.mlm_head_bidir = MLMHead(f.hidden_size, f.vocab_size,
                                      f.layer_norm_eps, self.dtype,
                                      name="mlm_head_bidir")
        self.itm_mlp = nn.Dense(2, kernel_init=normal_init(0.02),
                                dtype=self.dtype, name="itm_mlp")

    def __call__(self, image, caption_masked, caption_label, itm_label,
                 seq2seq: bool = False, deterministic: bool = True,
                 axis_name=None):
        """Returns the summed loss (MLM CE ignore -100 [+ ITM CE]) plus a
        metrics dict.  ``seq2seq`` is static: the reference flips it per
        batch with Python RNG (model.py:390-394)."""
        cfg = self.config
        feat = self.conv(image, deterministic)
        text_mask = caption_masked > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = self.fusion(caption_masked, text_mask, feat, image_mask,
                          seq2seq_mask=seq2seq, deterministic=deterministic)
        if self.is_initializing():
            # create params for BOTH heads regardless of the init-time flag
            self.mlm_head_seq2seq(out.text_output())
            self.mlm_head_bidir(out.text_output())
        head = self.mlm_head_seq2seq if seq2seq else self.mlm_head_bidir
        text_out, mlm_label = out.text_output(), caption_label
        if cfg.mlm_gather_k and not self.is_initializing():
            # vocab projection only on the <=10 masked positions
            # (lossless — see gather_label_positions)
            text_out, mlm_label = gather_label_positions(
                text_out, caption_label, cfg.mlm_gather_k)
        mlm_logits = head(text_out)

        metrics = {}
        loss = jnp.float32(0.0)
        if cfg.mlm_task:
            mlm_loss = cross_entropy_ignore_index(mlm_logits, mlm_label,
                                                  axis_name=axis_name)
            metrics["mlm_loss"] = mlm_loss
            loss = loss + mlm_loss
        if cfg.itm_task:
            itm_logits = self.itm_mlp(out.pooled)
            itm_loss = cross_entropy_ignore_index(itm_logits, itm_label,
                                                  axis_name=axis_name)
            metrics["itm_loss"] = itm_loss
            loss = loss + itm_loss
        metrics["loss"] = loss
        return loss, metrics


class RetrievalModel(nn.Module):
    """``MVLBertForRetrieval`` (model.py:423-476): pooled -> transform -> 2-way."""

    config: MVLTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv = VisualAdapter(cfg, self.dtype, name="conv")
        self.fusion = _fusion(cfg, pooling=True, dtype=self.dtype)
        self.transform = HeadTransform(cfg.fusion.hidden_size,
                                       cfg.fusion.layer_norm_eps, self.dtype,
                                       name="final_transform")
        self.final_linear = nn.Dense(2, kernel_init=normal_init(0.02),
                                     dtype=self.dtype, name="final_linear")

    def __call__(self, image, caption, deterministic: bool = True):
        """-> logits (B, 2); P(match) is softmax[..., 1] (run_retrieval.py:204)."""
        feat = self.conv(image, deterministic)
        text_mask = caption > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = self.fusion(caption, text_mask, feat, image_mask,
                          deterministic=deterministic)
        return self.final_linear(self.transform(out.pooled))

    def score(self, image, caption, deterministic: bool = True):
        logits = self(image, caption, deterministic)
        return nn.softmax(logits, axis=-1)[:, 1]

    def encode_image(self, image, deterministic: bool = True):
        """Backbone features only — lets the NxN retrieval grid run the
        visual encoder N times instead of N^2 (exact same scores; the
        reference recomputes the backbone per pair, run_retrieval.py:204)."""
        return self.conv(image, deterministic)

    def score_from_features(self, feat, caption,
                            deterministic: bool = True):
        text_mask = caption > 0
        image_mask = jnp.ones(feat.shape[:2], bool)
        out = self.fusion(caption, text_mask, feat, image_mask,
                          deterministic=deterministic)
        logits = self.final_linear(self.transform(out.pooled))
        return nn.softmax(logits, axis=-1)[:, 1]

    def loss(self, image, caption, label, deterministic: bool = False,
             axis_name=None):
        logits = self(image, caption, deterministic)
        return cross_entropy_ignore_index(logits, label,
                                          axis_name=axis_name), logits


class CaptionModel(nn.Module):
    """``MVLBertForImageCaption`` training path (model.py:479-546).

    ``encode_forward`` supports both learning strategies:
    - 'unilm': predict each (masked) token from its own hidden state
      under the seq2seq mask (model.py:533-536);
    - 'normal': shift-by-one — predict token t from the hidden state of
      t-1, with [SEP]'s hidden predicting the first token (model.py:537-541).

    Decoding (greedy/sample/beam with the static KV cache) lives in
    ``mvlt_tpu.models.generation`` and drives this module's ``fusion`` /
    ``mlm_head_seq2seq`` submodules.
    """

    config: MVLTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv = VisualAdapter(cfg, self.dtype, name="conv")
        self.fusion = _fusion(cfg, pooling=True, dtype=self.dtype)
        f = cfg.fusion
        self.mlm_head_seq2seq = MLMHead(f.hidden_size, f.vocab_size,
                                        f.layer_norm_eps, self.dtype,
                                        name="mlm_head_seq2seq")

    def encode_image(self, image, deterministic: bool = True):
        return self.conv(image, deterministic)

    def __call__(self, image, caption, learning_strategy: str = "unilm",
                 deterministic: bool = True):
        """Training logits: (B, L, vocab)."""
        feat = self.conv(image, deterministic)
        return self.encode_forward(feat, caption, learning_strategy,
                                   deterministic)

    def _fuse(self, image_feature, caption, deterministic: bool):
        """Shared seq2seq fusion pass (one definition for encode_forward
        and the gather-k loss path)."""
        text_mask = caption > 0
        image_mask = jnp.ones(image_feature.shape[:2], bool)
        return self.fusion(caption, text_mask, image_feature, image_mask,
                           seq2seq_mask=True, deterministic=deterministic)

    def encode_forward(self, image_feature, caption,
                       learning_strategy: str = "unilm",
                       deterministic: bool = True):
        out = self._fuse(image_feature, caption, deterministic)
        text_out = out.text_output()
        if learning_strategy == "unilm":
            return self.mlm_head_seq2seq(text_out)
        if learning_strategy == "normal":
            shifted = jnp.concatenate(
                [out.sep_output()[:, None], text_out[:, :-1]], axis=1)
            return self.mlm_head_seq2seq(shifted)
        raise NotImplementedError(f"learning_strategy {learning_strategy}")

    def loss(self, image, caption, labels, learning_strategy: str = "unilm",
             deterministic: bool = False, axis_name=None):
        cfg = self.config
        if (learning_strategy == "unilm" and cfg.mlm_gather_k
                and not self.is_initializing()):
            # 'unilm' labels are <=10 masked positions per sample (same
            # masking as pretraining) — project only those rows.  The
            # 'normal' (shift-by-one) strategy labels every position, so
            # it keeps the full-sequence logits.
            feat = self.conv(image, deterministic)
            out = self._fuse(feat, caption, deterministic)
            hid, lab = gather_label_positions(out.text_output(), labels,
                                              cfg.mlm_gather_k)
            logits = self.mlm_head_seq2seq(hid)
            return cross_entropy_ignore_index(logits, lab,
                                              axis_name=axis_name), logits
        logits = self(image, caption, learning_strategy, deterministic)
        return cross_entropy_ignore_index(logits, labels,
                                          axis_name=axis_name), logits
