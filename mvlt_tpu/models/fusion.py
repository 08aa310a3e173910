"""Single-stream multimodal fusion encoder (the reference's ``MVLBert``,
``modules/model.py:16-183``), re-designed as functional JAX/flax.

Sequence layout: ``[CLS] <image tokens> [SEP] <text tokens>``.
Token types: 1 for positions <= obj_end ([CLS]+image+[SEP]), 0 for text
(model.py:152-153).  Positions are a plain arange (model.py:156).

Parity quirks reproduced deliberately:
- the word-embedding table has ``vocab_size + 1`` rows (model.py:21);
- ``embedding_LayerNorm`` / ``embedding_dropout`` are DEFINED in the
  reference but never applied in ``get_embedding`` (model.py:25-26 vs
  74-160) — embeddings enter the encoder raw, and we do the same;
- attention masks are additive ``(1-m) * -10000.0`` (model.py:182);
- seq2seq (UniLM) mode ignores text padding (model.py:118-123).

KV-cached decoding uses a static-shape cache: the reference's per-step
"append [MASK], then slice it off the cache" (model.py:589-591, 758-763,
887-894) becomes a fixed-size buffer with a write index that simply never
commits the [MASK] slot.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mvlt_tpu.utils.env import env_flag
from flax import linen as nn

from mvlt_tpu.config import FusionConfig
from mvlt_tpu.ops import masks as mask_lib
from mvlt_tpu.ops.attention import multi_head_attention
from mvlt_tpu.ops.layers import gelu_exact, normal_init

def _tpu_native_ok() -> bool:
    from mvlt_tpu.ops.policy import tpu_native_ok
    return tpu_native_ok()



@dataclasses.dataclass
class FusionOutput:
    last_hidden: jnp.ndarray            # (B, S, H)
    pooled: Optional[jnp.ndarray]       # (B, H) or None
    obj_end: int                        # index of [SEP]
    text_end: int                       # one past last text token
    kv: Optional[Tuple] = None          # per-layer (k, v), each (B, nH, S, Dh)

    def text_output(self):
        return self.last_hidden[:, self.obj_end + 1:self.text_end]

    def image_output(self):
        return self.last_hidden[:, 1:self.obj_end]

    def sep_output(self):
        return self.last_hidden[:, self.obj_end]


def init_cache(config: FusionConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> dict:
    """Pre-allocated KV cache pytree: (L, B, nH, C, Dh) per tensor."""
    shape = (config.num_hidden_layers, batch, config.num_attention_heads,
             max_len, config.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


class SelfAttention(nn.Module):
    """BERT self-attention with optional static-shape KV cache."""

    config: FusionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias, cache_kv=None, write_pos=None,
                 deterministic: bool = True, need_kv: bool = False):
        cfg = self.config
        B, S, H = hidden.shape
        nH, Dh = cfg.num_attention_heads, cfg.head_dim

        def heads(x):
            return x.reshape(B, S, nH, Dh).transpose(0, 2, 1, 3)

        # NOTE: measured on v5e — fusing q/k/v into one (H, 3H) matmul is
        # throughput-neutral (XLA already schedules these well), so the
        # simple HF-layout three-dense form stays.
        dense = lambda name: nn.Dense(H, kernel_init=normal_init(cfg.initializer_range),
                                      dtype=self.dtype, name=name)
        q_dense, k_dense, v_dense = dense("query"), dense("key"), dense("value")
        out_dense = nn.Dense(H, kernel_init=normal_init(cfg.initializer_range),
                             dtype=self.dtype, name="out")

        # Fused Pallas path: qkv -> per-sample attention -> proj ->
        # +residual -> LN in one kernel (the post-LN attention half of
        # the BERT block).  Covers the non-cached full-sequence cases:
        # - bidirectional (key-only bias) and seq2seq/UniLM (per-query
        #   bias, threaded as the kernel's additive qbias);
        # - training dropout via multiplicative masks generated in XLA
        #   and applied in-kernel at the HF placements (post-softmax
        #   probs, post-projection hidden) — mask HBM reads are small
        #   next to the fused savings and the XLA fallback materializes
        #   the same tensors.  Opt out with MVLT_NO_FUSED_ENCODER=1.
        fusable_bias = bias is not None and bias.ndim == 4 \
            and bias.shape[1] == 1
        import os
        force = env_flag("MVLT_FORCE_FUSED_ENCODER")
        # Training uses the masked kernels too: their custom VJPs are
        # store-residual backwards (the forward kernel emits QKV/ctx, so
        # the backward skips the whole-forward recompute that made the
        # fused training path a wash in earlier measurements).
        if (cache_kv is None and fusable_bias and not need_kv
                and not self.is_initializing()
                and not env_flag("MVLT_NO_FUSED_ENCODER")
                and (_tpu_native_ok() or force)):
            from mvlt_tpu.ops.pallas_attn import (fused_attn_ln,
                                                  fused_attn_ln_masked)
            interp = force and jax.default_backend() != "tpu"
            cdt = self.dtype or hidden.dtype
            gv = lambda n: self.get_variable("params", n)
            wqkv = jnp.concatenate(
                [gv(n)["kernel"] for n in ("query", "key", "value")],
                axis=1).astype(cdt)
            bqkv = jnp.concatenate(
                [gv(n)["bias"] for n in ("query", "key", "value")]).astype(cdt)
            ln = self.get_variable("params", "out_layernorm")
            if bias.shape[2] == 1:                   # key-only (B,1,1,S)
                kbias, qbias = bias[:, 0, 0, :], None
            else:                                    # seq2seq (B,1,S,S)
                kbias = jnp.zeros((B, S), jnp.float32)
                qbias = bias[:, 0]
            amask = hmask = adrop_seed = None
            adrop_rate = 0.0
            if not deterministic and cfg.attention_probs_dropout_prob > 0:
                # MVLT_KERNEL_DROPOUT=1 (bf16, native): the attention-
                # dropout mask is drawn INSIDE the kernels (forward and
                # backward regenerate the same pltpu PRNG stream) —
                # no (B, nH, S, S) mask generation or HBM traffic.
                # On-chip parity-tested; measured neutral at flagship
                # shapes (405.7 vs 410.8 samples/s — rbg mask gen is
                # cheap), so the default stays the explicit mask.
                if (env_flag("MVLT_KERNEL_DROPOUT")
                        and cdt == jnp.bfloat16 and not interp):
                    adrop_rate = float(cfg.attention_probs_dropout_prob)
                    # two 16-bit halves as exact f32 (Mosaic rejects
                    # scalar f32->i32 bitcasts; converts are lossless)
                    adrop_seed = jax.random.randint(
                        self.make_rng("dropout"), (2,), 0, 2 ** 16,
                        jnp.int32).astype(jnp.float32)
                else:
                    keep = 1.0 - cfg.attention_probs_dropout_prob
                    amask = (jax.random.bernoulli(
                        self.make_rng("dropout"), keep, (B, nH, S, S))
                        .astype(cdt) / keep)
            if not deterministic and cfg.hidden_dropout_prob > 0:
                keep = 1.0 - cfg.hidden_dropout_prob
                hmask = (jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (B, S, H))
                    .astype(cdt) / keep)
            args = (hidden.astype(cdt), wqkv, bqkv,
                    gv("out")["kernel"].astype(cdt),
                    gv("out")["bias"].astype(cdt), kbias)
            tail = (ln["scale"].astype(jnp.float32),
                    ln["bias"].astype(jnp.float32), Dh ** -0.5, nH,
                    cfg.layer_norm_eps, 8, interp)
            if adrop_rate > 0.0:
                from mvlt_tpu.ops.pallas_attn import fused_attn_ln_adrop
                # positional call: custom_vjp + kwargs don't mix
                out = fused_attn_ln_adrop(
                    *args, qbias, hmask, tail[0], tail[1], adrop_seed,
                    tail[2], tail[3], adrop_rate, tail[4], tail[5],
                    tail[6])
            elif qbias is None and amask is None and hmask is None:
                out = fused_attn_ln(*args, *tail)
            else:
                out = fused_attn_ln_masked(*args, qbias, amask, hmask,
                                           *tail)
            return out, None, None

        q = heads(q_dense(hidden))
        k = heads(k_dense(hidden))
        v = heads(v_dense(hidden))

        new_cache = None
        if cache_kv is not None:
            ck, cv = cache_kv  # (B, nH, C, Dh)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, write_pos, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, write_pos, 0))
            k, v = ck.astype(self.dtype), cv.astype(self.dtype)
            new_cache = (ck, cv)

        dropout_rng = None
        if cfg.attention_probs_dropout_prob > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        ctx = multi_head_attention(
            q, k, v, bias,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=dropout_rng, deterministic=deterministic)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)

        out = out_dense(ctx)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="out_layernorm")(out + hidden)
        if cache_kv is not None:
            return out, (k, v), new_cache
        return out, (k, v), None


class EncoderLayer(nn.Module):
    config: FusionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias, cache_kv=None, write_pos=None,
                 deterministic: bool = True, need_kv: bool = False):
        cfg = self.config
        attn_out, kv, new_cache = SelfAttention(cfg, self.dtype, name="attention")(
            hidden, bias, cache_kv, write_pos, deterministic, need_kv)

        inter_dense = nn.Dense(cfg.intermediate_size,
                               kernel_init=normal_init(cfg.initializer_range),
                               dtype=self.dtype, name="intermediate")
        out_dense = nn.Dense(cfg.hidden_size,
                             kernel_init=normal_init(cfg.initializer_range),
                             dtype=self.dtype, name="output")

        # Fused post-LN MLP half (fc1 -> GELU -> fc2 -> +res -> LN) on TPU
        # for the non-cached full-sequence case; training hidden dropout
        # rides in as a multiplicative mask.  Decode steps (T<=2 rows)
        # are too small to benefit and stay on XLA.
        import os
        force = env_flag("MVLT_FORCE_FUSED_ENCODER")
        # training rides the masked kernel too (store-residual backward)
        if (cache_kv is None
                and not self.is_initializing()
                and not env_flag("MVLT_NO_FUSED_ENCODER")
                and (_tpu_native_ok() or force)):
            from mvlt_tpu.ops.pallas_attn import (fused_mlp_ln,
                                                  fused_mlp_ln_masked)
            interp = force and jax.default_backend() != "tpu"
            cdt = self.dtype or attn_out.dtype
            gv = lambda n: self.get_variable("params", n)
            ln = gv("output_layernorm")
            args = (attn_out.astype(cdt),
                    gv("intermediate")["kernel"].astype(cdt),
                    gv("intermediate")["bias"].astype(cdt),
                    gv("output")["kernel"].astype(cdt),
                    gv("output")["bias"].astype(cdt))
            tail = (ln["scale"].astype(jnp.float32),
                    ln["bias"].astype(jnp.float32), cfg.layer_norm_eps,
                    256, interp)
            if not deterministic and cfg.hidden_dropout_prob > 0:
                keep = 1.0 - cfg.hidden_dropout_prob
                hmask = (jax.random.bernoulli(
                    self.make_rng("dropout"), keep, attn_out.shape)
                    .astype(cdt) / keep)
                out = fused_mlp_ln_masked(*args, hmask, *tail)
            else:
                out = fused_mlp_ln(*args, *tail)
            return out, kv, new_cache

        inter = gelu_exact(inter_dense(attn_out))
        out = out_dense(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="output_layernorm")(out + attn_out)
        return out, kv, new_cache


class Pooler(nn.Module):
    """[CLS] pooler: dense + tanh (HF BertPooler; model.py:30)."""

    config: FusionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        out = nn.Dense(self.config.hidden_size,
                       kernel_init=normal_init(self.config.initializer_range),
                       dtype=self.dtype, name="dense")(first)
        return jnp.tanh(out)


class FusionEncoder(nn.Module):
    """MVLBert equivalent: embeddings + mask build + N-layer encoder + pooler."""

    config: FusionConfig
    add_pooling_layer: bool = False
    dtype: jnp.dtype = jnp.float32
    cls_token_id: int = 101
    sep_token_id: int = 102
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(cfg.embedding_rows, cfg.hidden_size,
                                        embedding_init=normal_init(cfg.initializer_range),
                                        dtype=self.dtype, name="word_embeddings")
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                                            embedding_init=normal_init(cfg.initializer_range),
                                            dtype=self.dtype, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                                              embedding_init=normal_init(cfg.initializer_range),
                                              dtype=self.dtype, name="token_type_embeddings")
        layer_cls = EncoderLayer
        if self.remat:
            # args: (self, hidden, bias, cache_kv, write_pos,
            #        deterministic, need_kv)
            layer_cls = nn.remat(EncoderLayer, static_argnums=(5, 6))
        self.layers = [layer_cls(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.num_hidden_layers)]
        if self.add_pooling_layer:
            self.pooler = Pooler(cfg, self.dtype, name="pooler")

    # ------------------------------------------------------------------
    # full (non-incremental) forward — reference model.py:35-72 + 110-160
    # ------------------------------------------------------------------
    def __call__(self, text_idx, text_mask, image_feature, image_mask,
                 seq2seq_mask: bool = False, deterministic: bool = True,
                 return_kv: bool = False) -> FusionOutput:
        cfg = self.config
        batch, num_obj = image_feature.shape[0], image_feature.shape[1]
        obj_end = num_obj + 1                       # index of [SEP]
        seq_len = 0 if text_idx is None else text_idx.shape[1]
        text_end = obj_end + seq_len + 1
        total = num_obj + seq_len + 2

        cls_ids = jnp.full((batch, 1), self.cls_token_id, jnp.int32)
        sep_ids = jnp.full((batch, 1), self.sep_token_id, jnp.int32)
        parts = [self.word_embeddings(cls_ids),
                 image_feature.astype(self.dtype),
                 self.word_embeddings(sep_ids)]
        if text_idx is not None:
            parts.append(self.word_embeddings(text_idx))
        vl = jnp.concatenate(parts, axis=1)

        pos = jnp.arange(total, dtype=jnp.int32)
        token_type = jnp.where(pos <= obj_end, 1, 0)
        emb = (vl + self.token_type_embeddings(token_type)[None]
               + self.position_embeddings(pos)[None])

        if seq2seq_mask:
            mask = mask_lib.seq2seq_fusion_mask(batch, obj_end, total)
        else:
            mask = mask_lib.bidirectional_key_mask(
                image_mask, text_mask if text_idx is not None else None)
        bias = mask_lib.mask_to_bias(mask, jnp.float32)

        hidden = emb
        kvs = []
        for layer in self.layers:
            hidden, kv, _ = layer(hidden, bias, None, None, deterministic,
                                  return_kv)
            if return_kv:
                kvs.append(kv)

        pooled = self.pooler(hidden) if self.add_pooling_layer else None
        return FusionOutput(hidden, pooled, obj_end, text_end,
                            kv=tuple(kvs) if return_kv else None)

    # ------------------------------------------------------------------
    # incremental decode — reference model.py:82-108 with static cache
    # ------------------------------------------------------------------
    def decode_step(self, tokens, cache, write_pos, deterministic: bool = True):
        """Run T (=1 or 2) tokens against the static cache.

        tokens: (B, T) int32; their absolute positions are
        ``write_pos + [0..T)``.  Returns (hidden (B,T,H), updated cache).
        """
        cfg = self.config
        B, T = tokens.shape
        pos = write_pos + jnp.arange(T, dtype=jnp.int32)
        emb = (self.word_embeddings(tokens)
               + self.token_type_embeddings(jnp.zeros((B, T), jnp.int32))
               + self.position_embeddings(pos)[None])

        cache_len = cache["k"].shape[3]
        mask = mask_lib.decode_step_mask(B, T, cache_len, write_pos)
        bias = mask_lib.mask_to_bias(mask, jnp.float32)

        hidden = emb
        ck, cv = cache["k"], cache["v"]
        for i, layer in enumerate(self.layers):
            # need_kv passed explicitly: the remat-wrapped layer declares
            # static_argnums=(5, 6), so every positional arg up to and
            # including need_kv must be present
            hidden, _, new_cache = layer(
                hidden, bias, (ck[i], cv[i]), write_pos, deterministic,
                False)
            # write the layer's updated K/V back into the stacked buffer
            # in place (a slice + jnp.stack rebuild would copy the whole
            # 12-layer cache every decode step)
            ck = jax.lax.dynamic_update_index_in_dim(
                ck, new_cache[0].astype(ck.dtype), i, axis=0)
            cv = jax.lax.dynamic_update_index_in_dim(
                cv, new_cache[1].astype(cv.dtype), i, axis=0)
        return hidden, {"k": ck, "v": cv}
