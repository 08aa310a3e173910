"""Swin Transformer backbone, TPU-first (flax.linen + XLA; Pallas window
attention pluggable via ``mvlt_tpu.ops.pallas_attn``).

Re-design of the reference's vendored Microsoft Swin
(``modules/visual_feature_extractor.py:113-702``), not a translation:

- **Patch embedding is a reshape + matmul**, not a conv: the 4x4/stride-4
  conv (reference ``PatchEmbed``, visual_feature_extractor.py:527-572) is a
  non-overlapping patchify, which maps onto the MXU as one big dense layer
  over flattened patches (NHWC layout).
- **Static SW-MSA masks**: the shifted-window attention mask (reference
  :318-348) is precomputed in numpy at trace time (additive -100 bias,
  matching the reference's ``masked_fill(-100.0)``) — no data-dependent
  control flow under jit.
- **Cyclic shift** is ``jnp.roll`` (reference ``torch.roll``, :361, :378).
- **Relative position bias** (reference :204-214, :240-244) is a gather
  from a ``(2w-1)^2 x nH`` table with a static index — folded into the
  attention bias ahead of the softmax so XLA fuses it.
- **Window partition** (reference :144-160) is reshape/transpose, done once
  per block on the NHWC feature map.
- Stochastic depth (timm ``DropPath``) and per-block linspace decay rule
  (reference :654) are reproduced exactly.

Weight layout is convertible 1:1 from the official ``swin_*_patch4_window7_224.pth``
checkpoints (fused qkv) and from HF ``SwinModel`` (split q/k/v) — see
``mvlt_tpu/utils/convert.py``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from mvlt_tpu.utils.env import env_flag
import numpy as np
from flax import linen as nn

from mvlt_tpu.config import SwinConfig
from mvlt_tpu.ops.layers import DropPath, Mlp, trunc_normal_init

Dtype = Any

def _tpu_native_ok() -> bool:
    from mvlt_tpu.ops.policy import tpu_native_ok
    return tpu_native_ok()



@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative position index inside a (wh, ww) window
    (reference visual_feature_extractor.py:204-214). Static table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)                              # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]                 # (2, N, N)
    rel = rel.transpose(1, 2, 0)                              # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)                                        # (N, N)


@functools.lru_cache(maxsize=None)
def _rel_index_onehot(wh: int, ww: int) -> np.ndarray:
    """(N*N, (2wh-1)(2ww-1)) one-hot of :func:`relative_position_index`.

    The bias lookup runs as ``onehot @ table`` instead of ``table[idx]``:
    the transposed matmul in the backward replaces XLA's serialized
    scatter-add into the table (2401 updates/block on TPU) with one MXU
    dot."""
    idx = relative_position_index(wh, ww).reshape(-1)
    oh = np.zeros((idx.size, (2 * wh - 1) * (2 * ww - 1)), np.float32)
    oh[np.arange(idx.size), idx] = 1.0
    return oh


def rel_bias_from_table(table: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """Per-head relative-position bias (N*N, nH) from the learned table
    ((2wh-1)(2ww-1), nH) via one-hot matmul (scatter-free backward)."""
    oh = jnp.asarray(_rel_index_onehot(wh, ww), table.dtype)
    return oh @ table


@functools.lru_cache(maxsize=None)
def shifted_window_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask, (nW, N, N) float32 with 0 / -100 entries
    (reference visual_feature_extractor.py:318-348)."""
    img = np.zeros((H, W), np.int32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img[h, w] = cnt
            cnt += 1
    # window partition
    img = img.reshape(H // window, window, W // window, window)
    win = img.transpose(0, 2, 1, 3).reshape(-1, window * window)   # (nW, N)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nW, window*window, C) (reference :144-160)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(windows: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition` (reference :163-173)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // window // window)
    x = windows.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias
    (reference visual_feature_extractor.py:176-257).

    ``attn_impl``: 'auto' (Pallas fused kernel on TPU, XLA elsewhere),
    'pallas', 'interpret' (Pallas in interpreter mode, for CPU tests),
    or 'xla'.
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[Dtype] = None
    attn_impl: str = "auto"
    windows_per_image: int = 1

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True):
        """x: (B_, N, C) windows; mask: static (nW, N, N) additive or None."""
        B_, N, C = x.shape
        nH = self.num_heads
        Dh = self.dim // nH
        scale = self.qk_scale or Dh ** -0.5

        qkv_dense = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                             kernel_init=trunc_normal_init(0.02),
                             dtype=self.dtype, name="qkv")
        proj_dense = nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                              dtype=self.dtype, name="proj")

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1), nH))
        rel_bias = rel_bias_from_table(table, *self.window_size) \
            .reshape(N, N, nH).transpose(2, 0, 1)             # (nH, N, N)

        # combined bias per in-image window pattern: (nWb, nH, N, N)
        combined = rel_bias[None].astype(jnp.float32)
        if mask is not None:
            combined = combined + jnp.asarray(mask)[:, None]

        impl = self.attn_impl
        if impl == "auto":
            # Measured on v5e (batch 64, Swin-S, PERF.md): the block-fused
            # kernel (qkv proj + attention + out proj in VMEM) runs the
            # backbone 56 -> 39 ms (+43%). The narrower attention-only
            # kernel loses to XLA's fusion and stays opt-in ('pallas').
            # Attention dropout can't run inside the kernel -> XLA then.
            drop_active = self.attn_drop > 0.0 and not deterministic
            impl = ("pallas_block" if _tpu_native_ok()
                    and not drop_active else "xla")
        elif (impl in ("pallas_block", "pallas", "interpret_block",
                       "interpret")
              and self.attn_drop > 0.0 and not deterministic):
            # the kernels cannot apply attention-prob dropout; silently
            # training without the configured regularizer would be worse
            # than failing (the 'auto' path falls back to XLA instead)
            raise ValueError(
                f"attn_impl={impl!r} cannot apply attention dropout "
                f"(attn_drop_rate={self.attn_drop}); use attn_impl='auto' "
                "or 'xla' for training with attention dropout")

        if impl in ("pallas_block", "interpret_block") \
                and not self.is_initializing():
            # widest fusion: qkv proj + attention + out proj in one kernel;
            # param values pulled from the (already created) Dense scopes
            from mvlt_tpu.ops.pallas_attn import window_block_attention
            wqkv = self.get_variable("params", "qkv")["kernel"].astype(
                self.dtype or x.dtype)
            bqkv = self.get_variable("params", "qkv")["bias"].astype(
                self.dtype or x.dtype)
            wproj = self.get_variable("params", "proj")["kernel"].astype(
                self.dtype or x.dtype)
            bproj = self.get_variable("params", "proj")["bias"].astype(
                self.dtype or x.dtype)
            out = window_block_attention(
                x.astype(wqkv.dtype), wqkv, bqkv, wproj, bproj, combined,
                scale, nH, interpret=(impl == "interpret_block"))
            return nn.Dropout(self.proj_drop)(out,
                                              deterministic=deterministic)

        qkv = qkv_dense(x)
        qkv = qkv.reshape(B_, N, 3, nH, Dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                      # (B_, nH, N, Dh)

        if impl in ("pallas", "interpret"):
            from mvlt_tpu.ops.pallas_attn import window_attention
            ctx = window_attention(q, k, v, combined, scale,
                                   interpret=(impl == "interpret"))
        else:
            bias = combined[jnp.arange(B_) % combined.shape[0]] \
                if combined.shape[0] > 1 else combined
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale,
                              k.astype(q.dtype),
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn + bias, axis=-1).astype(q.dtype)
            if self.attn_drop > 0.0 and not deterministic:
                attn = nn.Dropout(self.attn_drop)(attn, deterministic=False)
            ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B_, N, C)

        out = proj_dense(ctx)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    """One Swin block: (S)W-MSA + MLP with pre-LN and stochastic depth
    (reference visual_feature_extractor.py:273-391)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        H, W = self.input_resolution
        B, L, C = x.shape

        window, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= window:
            # window larger than the map: no partitioning, no shift
            # (reference :302-305)
            window, shift = min(self.input_resolution), 0

        # Widest fusion: deterministic inference runs the WHOLE block
        # (LN1 -> attn -> +res -> LN2 -> MLP -> +res) in one Pallas kernel
        # (DropPath/dropout are identity when deterministic).
        impl = self.attn_impl
        # whole-block kernel weights (qkv+proj+fc1+fc2 = 12*C^2 params,
        # bf16) must leave VMEM room for activations: C=768 (stage 4) is
        # 14.2MB against the 16MB scoped limit and can OOM; those blocks
        # use the attention-only kernel + XLA MLP instead.
        weights_fit = 12 * C * C * 2 <= 12 * 1024 * 1024
        full_ok = not self.is_initializing() and deterministic and (
            impl == "interpret_full"
            or (impl == "auto" and _tpu_native_ok()
                and weights_fit))
        if full_ok:
            return self._fused_full_block(x, window, shift,
                                          interpret=(impl == "interpret_full"))
        # TRAINING forward can also use the whole-block kernel when the
        # only stochastic element is DropPath (the Swin config of record
        # has drop_rate = attn_drop_rate = 0): stochastic depth becomes
        # per-row branch multipliers fed to the kernel; backward runs the
        # fast-core composition (Pallas attention-core VJP).
        train_ok = not self.is_initializing() and not deterministic and (
            self.drop == 0.0 and self.attn_drop == 0.0) and (
            impl == "interpret_full"
            or (impl == "auto" and _tpu_native_ok()
                and weights_fit))
        if train_ok:
            dp = None
            if self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rows = H * W
                def draw():
                    m = jax.random.bernoulli(
                        self.make_rng("dropout"), p=keep, shape=(B,))
                    m = m.astype(jnp.float32) / keep
                    return jnp.repeat(m, rows)[:, None]
                dp = (draw(), draw())
            return self._fused_full_block(
                x, window, shift, interpret=(impl == "interpret_full"),
                dp=dp)
        # Wide stages (e.g. Swin-S stage 4, C=768): whole-block weights
        # exceed VMEM, but the block still fuses as pre-LN HALVES split at
        # its residual boundaries (attn half 4C^2, MLP half 8C^2 weights).
        half_ok = not self.is_initializing() and deterministic and (
            impl == "interpret_half"
            or (impl == "auto" and _tpu_native_ok()
                and not weights_fit and 8 * C * C * 2 <= 12 * 1024 * 1024))
        if half_ok:
            return self._fused_half_blocks(
                x, window, shift, interpret=(impl == "interpret_half"))
        # Wide-stage TRAINING: same stochastic-depth-only condition as the
        # whole-block training path, but the forward runs in three
        # VMEM-light pieces (LN1+qkv / attention core / proj+LN2+MLP tail)
        # and the backward is the stored-residual composition.
        train_half_ok = not self.is_initializing() and not deterministic \
            and (self.drop == 0.0 and self.attn_drop == 0.0) \
            and not env_flag("MVLT_NO_HALF_TRAIN") and (
                impl == "interpret_half"
                or (impl == "auto" and _tpu_native_ok() and not weights_fit))
        if train_half_ok:
            dp = None
            if self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rows = H * W
                def draw():
                    m = jax.random.bernoulli(
                        self.make_rng("dropout"), p=keep, shape=(B,))
                    m = m.astype(jnp.float32) / keep
                    return jnp.repeat(m, rows)[:, None]
                dp = (draw(), draw())
            return self._fused_half_train(
                x, window, shift, interpret=(impl == "interpret_half"),
                dp=dp)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(H, W, window, shift)
        else:
            mask = None

        windows = window_partition(x, window)                 # (B*nW, N, C)
        attn_windows = WindowAttention(
            self.dim, (window, window), self.num_heads, self.qkv_bias,
            self.qk_scale, self.attn_drop, self.drop,
            dtype=self.dtype, attn_impl=self.attn_impl,
            windows_per_image=(H // window) * (W // window),
            name="attn")(windows, mask, deterministic)
        x = window_reverse(attn_windows, window, H, W)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(B, H * W, C)

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)

    def _fused_full_block(self, x, window: int, shift: int,
                          interpret: bool, dp=None) -> jnp.ndarray:
        """Whole-block Pallas path (deterministic). Partition/roll stay in
        XLA; everything between lives in VMEM."""
        from mvlt_tpu.ops.pallas_attn import swin_full_block

        H, W = self.input_resolution
        B, L, C = x.shape
        nH = self.num_heads
        scale = self.qk_scale or (C // nH) ** -0.5
        cdt = self.dtype or x.dtype

        gv = lambda name: self.get_variable("params", name)
        attn_p = gv("attn")
        table = attn_p["relative_position_bias_table"]
        N = window * window
        rel = rel_bias_from_table(table, window, window) \
            .reshape(N, N, nH).transpose(2, 0, 1)
        combined = rel[None].astype(jnp.float32)
        shift_mask = None
        if shift > 0:
            shift_mask = jnp.asarray(shifted_window_mask(H, W, window, shift))

        params = (
            gv("norm1")["scale"].astype(jnp.float32),
            gv("norm1")["bias"].astype(jnp.float32),
            attn_p["qkv"]["kernel"].astype(cdt),
            attn_p["qkv"]["bias"].astype(cdt),
            attn_p["proj"]["kernel"].astype(cdt),
            attn_p["proj"]["bias"].astype(cdt),
            gv("norm2")["scale"].astype(jnp.float32),
            gv("norm2")["bias"].astype(jnp.float32),
            gv("mlp")["fc1"]["kernel"].astype(cdt),
            gv("mlp")["fc1"]["bias"].astype(cdt),
            gv("mlp")["fc2"]["kernel"].astype(cdt),
            gv("mlp")["fc2"]["bias"].astype(cdt),
        )

        xm = x.reshape(B, H, W, C)
        if shift > 0:
            from mvlt_tpu.ops.pallas_attn import shift_kernel_feasible
            if shift_kernel_feasible(H, W, window, C, B,
                                     with_dp=dp is not None):
                # Fold the cyclic roll into the kernel: input/output stay in
                # UNSHIFTED window layout, so the XLA partition/reverse of
                # adjacent blocks cancel to identity and no roll HBM passes
                # remain (reference torch.roll, visual_feature_extractor.py
                # :361,378).  Bias ships split (shared rel, compact mask).
                windows = window_partition(xm, window).astype(cdt)
                out = swin_full_block(windows, params,
                                      (combined, shift_mask), scale, nH,
                                      interpret=interpret,
                                      shift_spec=(H, W, window, shift),
                                      dp=dp)
                return window_reverse(out, window, H, W).reshape(B, H * W, C)
            combined = combined + shift_mask[:, None]
            xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(xm, window).astype(cdt)
        out = swin_full_block(windows, params, combined, scale, nH,
                              interpret=interpret, dp=dp)
        xm = window_reverse(out, window, H, W)
        if shift > 0:
            xm = jnp.roll(xm, shift=(shift, shift), axis=(1, 2))
        return xm.reshape(B, H * W, C)

    def _fused_half_train(self, x, window: int, shift: int,
                          interpret: bool, dp=None) -> jnp.ndarray:
        """Wide-channel training path: three-piece kernel forward with the
        stored-residual backward (:func:`swin_half_block`). Roll/partition
        stay in XLA; shift enters as an additive mask on the bias."""
        from mvlt_tpu.ops.pallas_attn import swin_half_block

        H, W = self.input_resolution
        B, L, C = x.shape
        nH = self.num_heads
        scale = self.qk_scale or (C // nH) ** -0.5
        cdt = self.dtype or x.dtype

        gv = lambda name: self.get_variable("params", name)
        attn_p = gv("attn")
        table = attn_p["relative_position_bias_table"]
        N = window * window
        rel = rel_bias_from_table(table, window, window) \
            .reshape(N, N, nH).transpose(2, 0, 1)
        combined = rel[None].astype(jnp.float32)
        if shift > 0:
            combined = combined + jnp.asarray(
                shifted_window_mask(H, W, window, shift))[:, None]

        params = (
            gv("norm1")["scale"].astype(jnp.float32),
            gv("norm1")["bias"].astype(jnp.float32),
            attn_p["qkv"]["kernel"].astype(cdt),
            attn_p["qkv"]["bias"].astype(cdt),
            attn_p["proj"]["kernel"].astype(cdt),
            attn_p["proj"]["bias"].astype(cdt),
            gv("norm2")["scale"].astype(jnp.float32),
            gv("norm2")["bias"].astype(jnp.float32),
            gv("mlp")["fc1"]["kernel"].astype(cdt),
            gv("mlp")["fc1"]["bias"].astype(cdt),
            gv("mlp")["fc2"]["kernel"].astype(cdt),
            gv("mlp")["fc2"]["bias"].astype(cdt),
        )

        xm = x.reshape(B, H, W, C)
        if shift > 0:
            xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(xm, window).astype(cdt)
        out = swin_half_block(windows, params, combined, dp, scale, nH,
                              interpret)
        xm = window_reverse(out, window, H, W)
        if shift > 0:
            xm = jnp.roll(xm, shift=(shift, shift), axis=(1, 2))
        return xm.reshape(B, H * W, C)

    def _fused_half_blocks(self, x, window: int, shift: int,
                           interpret: bool) -> jnp.ndarray:
        """Pre-LN half-block Pallas path (deterministic, wide channels)."""
        from mvlt_tpu.ops.pallas_attn import fused_mlp_preln, swin_attn_half

        H, W = self.input_resolution
        B, L, C = x.shape
        nH = self.num_heads
        scale = self.qk_scale or (C // nH) ** -0.5
        cdt = self.dtype or x.dtype

        gv = lambda name: self.get_variable("params", name)
        attn_p = gv("attn")
        table = attn_p["relative_position_bias_table"]
        N = window * window
        rel = rel_bias_from_table(table, window, window) \
            .reshape(N, N, nH).transpose(2, 0, 1)
        combined = rel[None].astype(jnp.float32)
        if shift > 0:
            combined = combined + jnp.asarray(
                shifted_window_mask(H, W, window, shift))[:, None]

        xm = x.reshape(B, H, W, C)
        if shift > 0:
            xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(xm, window).astype(cdt)

        y = swin_attn_half(
            windows,
            gv("norm1")["scale"].astype(jnp.float32),
            gv("norm1")["bias"].astype(jnp.float32),
            attn_p["qkv"]["kernel"].astype(cdt),
            attn_p["qkv"]["bias"].astype(cdt),
            attn_p["proj"]["kernel"].astype(cdt),
            attn_p["proj"]["bias"].astype(cdt),
            combined, scale, nH, interpret=interpret)

        y = fused_mlp_preln(
            y,
            gv("norm2")["scale"].astype(jnp.float32),
            gv("norm2")["bias"].astype(jnp.float32),
            gv("mlp")["fc1"]["kernel"].astype(cdt),
            gv("mlp")["fc1"]["bias"].astype(cdt),
            gv("mlp")["fc2"]["kernel"].astype(cdt),
            gv("mlp")["fc2"]["bias"].astype(cdt),
            interpret=interpret)

        xm = window_reverse(y, window, H, W)
        if shift > 0:
            xm = jnp.roll(xm, shift=(shift, shift), axis=(1, 2))
        return xm.reshape(B, H * W, C)


class PatchMerging(nn.Module):
    """2x2 patch merging downsample (reference :408-454)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        kernel_init=trunc_normal_init(0.02),
                        dtype=self.dtype, name="reduction")(x)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as reshape + dense (MXU-native equivalent of
    the reference's 4x4/stride-4 conv, visual_feature_extractor.py:527-572).

    Input is NHWC. The dense kernel layout is ``(ph*pw*c, embed)`` with
    patch pixels flattened in (ph, pw, c) order; ``convert.py`` reshapes
    conv weights ``(embed, c, ph, pw)`` accordingly.
    """

    patch_size: int
    embed_dim: int
    patch_norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p), p * p * C)
        x = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(0.02),
                     dtype=self.dtype, name="proj")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class SwinTransformer(nn.Module):
    """Hierarchical Swin encoder; returns all final-stage tokens
    (B, H/32 * W/32, num_features) with no pooling or head, matching the
    reference's feature-extractor use (visual_feature_extractor.py:676-693).

    ``remat=True`` wraps each block in ``jax.checkpoint`` (the TPU
    equivalent of the reference's optional ``torch.utils.checkpoint``,
    :505-510).
    """

    config: SwinConfig
    dtype: Optional[Dtype] = None
    remat: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        if x.shape[1] == cfg.in_chans and x.shape[1] != x.shape[2]:
            # Accept NCHW for drop-in parity with the reference's pipelines;
            # transpose once to the TPU-preferred NHWC.
            x = x.transpose(0, 2, 3, 1)
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, cfg.patch_norm,
                       dtype=self.dtype, name="patch_embed")(x)

        if cfg.ape:
            pr = cfg.patches_resolution
            ape = self.param("absolute_pos_embed", trunc_normal_init(0.02),
                             (1, pr[0] * pr[1], cfg.embed_dim))
            x = x + ape
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        # stochastic depth linspace decay over all blocks (reference :654)
        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()

        block_cls = SwinBlock
        if self.remat:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))

        for i_layer in range(cfg.num_layers):
            dim = int(cfg.embed_dim * 2 ** i_layer)
            res = (cfg.patches_resolution[0] // (2 ** i_layer),
                   cfg.patches_resolution[1] // (2 ** i_layer))
            offset = sum(cfg.depths[:i_layer])
            for i_block in range(cfg.depths[i_layer]):
                x = block_cls(
                    dim=dim, input_resolution=res,
                    num_heads=cfg.num_heads[i_layer],
                    window_size=cfg.window_size,
                    shift_size=0 if i_block % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                    attn_drop=cfg.attn_drop_rate,
                    drop_path=float(dpr[offset + i_block]),
                    dtype=self.dtype, attn_impl=self.attn_impl,
                    name=f"layers_{i_layer}_blocks_{i_block}",
                )(x, deterministic)
            if i_layer < cfg.num_layers - 1:
                x = PatchMerging(res, dim, dtype=self.dtype,
                                 name=f"layers_{i_layer}_downsample")(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x
