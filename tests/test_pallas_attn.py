"""Pallas window-attention kernel: parity vs the XLA einsum path
(interpret mode on CPU), gradients, and Swin integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvlt_tpu.config import SwinConfig
from mvlt_tpu.models.backbones.swin import SwinTransformer
from mvlt_tpu.ops.pallas_attn import _xla_reference, window_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("nWb,BW", [(1, 8), (4, 16), (16, 16)])
def test_kernel_matches_xla(nWb, BW):
    nH, N, Dh = 3, 49, 32
    q = _rand((BW, nH, N, Dh), 0)
    k = _rand((BW, nH, N, Dh), 1)
    v = _rand((BW, nH, N, Dh), 2)
    bias = _rand((nWb, nH, N, N), 3) * 0.1
    got = window_attention(q, k, v, bias, Dh ** -0.5, interpret=True)
    want, _ = _xla_reference(q, k, v, bias, Dh ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_grad_matches_xla():
    nH, N, Dh, BW, nWb = 2, 16, 8, 4, 2
    q = _rand((BW, nH, N, Dh), 0)
    k = _rand((BW, nH, N, Dh), 1)
    v = _rand((BW, nH, N, Dh), 2)
    bias = _rand((nWb, nH, N, N), 3) * 0.1

    def loss_kernel(q, k, v, bias):
        return window_attention(q, k, v, bias, Dh ** -0.5,
                                interpret=True).sum()

    def loss_ref(q, k, v, bias):
        out, _ = _xla_reference(q, k, v, bias, Dh ** -0.5)
        return out.sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_swin_interpret_matches_xla_impl():
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 4), window_size=4, drop_path_rate=0.0)
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    xla_model = SwinTransformer(cfg, attn_impl="xla")
    params = xla_model.init(jax.random.PRNGKey(0), img)["params"]
    want = xla_model.apply({"params": params}, img)
    got = SwinTransformer(cfg, attn_impl="interpret").apply(
        {"params": params}, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_block_kernel_matches_xla():
    from mvlt_tpu.ops.pallas_attn import _block_xla_ref, window_block_attention

    BW, N, C, nH, nWb = 16, 49, 32, 4, 4
    x = _rand((BW, N, C), 10)
    wqkv = _rand((C, 3 * C), 11) * 0.2
    bqkv = _rand((3 * C,), 12) * 0.1
    wproj = _rand((C, C), 13) * 0.2
    bproj = _rand((C,), 14) * 0.1
    bias = _rand((nWb, nH, N, N), 15) * 0.1
    scale = (C // nH) ** -0.5
    got = window_block_attention(x, wqkv, bqkv, wproj, bproj, bias,
                                 scale, nH, interpret=True)
    want = _block_xla_ref(x, wqkv, bqkv, wproj, bproj, bias, scale, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_block_kernel_grad_matches_xla():
    from mvlt_tpu.ops.pallas_attn import _block_xla_ref, window_block_attention

    BW, N, C, nH, nWb = 4, 16, 8, 2, 2
    args = (_rand((BW, N, C), 0), _rand((C, 3 * C), 1) * 0.2,
            _rand((3 * C,), 2) * 0.1, _rand((C, C), 3) * 0.2,
            _rand((C,), 4) * 0.1, _rand((nWb, nH, N, N), 5) * 0.1)
    scale = (C // nH) ** -0.5
    g1 = jax.grad(lambda *a: window_block_attention(
        *a, scale, nH, interpret=True).sum(), argnums=tuple(range(6)))(*args)
    g2 = jax.grad(lambda *a: _block_xla_ref(*a, scale, nH).sum(),
                  argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_swin_block_impl_matches_xla_impl():
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 4), window_size=4, drop_path_rate=0.0)
    img = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    xla_model = SwinTransformer(cfg, attn_impl="xla")
    params = xla_model.init(jax.random.PRNGKey(0), img)["params"]
    want = xla_model.apply({"params": params}, img)
    got = SwinTransformer(cfg, attn_impl="interpret_block").apply(
        {"params": params}, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_swin_full_block_impl_matches_xla_impl():
    cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 4), window_size=4, drop_path_rate=0.0)
    img = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 3, 32, 32)).astype(np.float32))
    xla_model = SwinTransformer(cfg, attn_impl="xla")
    params = xla_model.init(jax.random.PRNGKey(1), img)["params"]
    want = xla_model.apply({"params": params}, img)
    got = SwinTransformer(cfg, attn_impl="interpret_full").apply(
        {"params": params}, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_full_block_padded_path_matches_ref():
    """N=49, nWb=4: no 8-aligned G exists → the pad-to-56 branch runs."""
    from mvlt_tpu.ops.pallas_attn import _full_xla_ref, swin_full_block

    BW, N, C, nH, nWb = 8, 49, 16, 2, 4
    x = _rand((BW, N, C), 20)
    params = (jnp.ones((C,)), jnp.zeros((C,)),                       # ln1
              _rand((C, 3 * C), 21) * 0.2, _rand((3 * C,), 22) * 0.1,
              _rand((C, C), 23) * 0.2, _rand((C,), 24) * 0.1,
              jnp.ones((C,)), jnp.zeros((C,)),                       # ln2
              _rand((C, 4 * C), 25) * 0.2, _rand((4 * C,), 26) * 0.1,
              _rand((4 * C, C), 27) * 0.2, _rand((C,), 28) * 0.1)
    bias = _rand((nWb, nH, N, N), 29) * 0.1
    scale = (C // nH) ** -0.5
    got = swin_full_block(x, params, bias, scale, nH, interpret=True)
    want = _full_xla_ref(x, params, bias, scale, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_seq_attention_matches_ref():
    """Fusion-encoder attention kernel: qkv+attn+proj with per-sample key
    bias, incl. the pad-to-multiple-of-8 path (N=75-like)."""
    from mvlt_tpu.ops.pallas_attn import (_seq_attn_xla_ref,
                                          fused_seq_attention)

    B, N, C, nH = 4, 11, 16, 2
    x = _rand((B, N, C), 30)
    wqkv = _rand((C, 3 * C), 31) * 0.2
    bqkv = _rand((3 * C,), 32) * 0.1
    wproj = _rand((C, C), 33) * 0.2
    bproj = _rand((C,), 34) * 0.1
    # key bias: 0 for valid, -10000 for padded keys (masks.mask_to_bias)
    kbias = jnp.where(jnp.arange(N)[None, :] < jnp.array([[11], [7], [9], [3]]),
                      0.0, -10000.0).astype(jnp.float32)
    scale = (C // nH) ** -0.5
    got = fused_seq_attention(x, wqkv, bqkv, wproj, bproj, kbias, scale, nH,
                              interpret=True)
    want = _seq_attn_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, scale, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # gradients via the recompute VJP
    g1 = jax.grad(lambda *a: fused_seq_attention(
        *a, scale, nH, interpret=True).sum(), argnums=(0, 1, 5))(
        x, wqkv, bqkv, wproj, bproj, kbias)
    g2 = jax.grad(lambda *a: _seq_attn_xla_ref(*a, scale, nH).sum(),
                  argnums=(0, 1, 5))(x, wqkv, bqkv, wproj, bproj, kbias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_attn_ln_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _attn_ln_xla_ref, fused_attn_ln
    rng = np.random.default_rng(5)
    B, N, C, nH = 4, 11, 32, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    kbias = jnp.where(jnp.asarray(rng.random((B, N))) < 0.2, -10000.0, 0.0)
    lns = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    got = fused_attn_ln(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb,
                        scale, nH, 1e-12, interpret=True)
    want = _attn_ln_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb,
                            scale, nH, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_attn_ln_grad_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _attn_ln_xla_ref, fused_attn_ln
    rng = np.random.default_rng(6)
    B, N, C, nH = 2, 8, 16, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    bproj = jnp.zeros((C,), jnp.float32)
    kbias = jnp.zeros((B, N), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)
    scale = (C // nH) ** -0.5

    def loss_kernel(x, wqkv, wproj):
        return fused_attn_ln(x, wqkv, bqkv, wproj, bproj, kbias, lns, lnb,
                             scale, nH, 1e-12, interpret=True).sum()

    def loss_ref(x, wqkv, wproj):
        return _attn_ln_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, lns,
                                lnb, scale, nH, 1e-12).sum()

    ga = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, wqkv, wproj)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wqkv, wproj)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_mlp_ln_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _mlp_ln_xla_ref, fused_mlp_ln
    rng = np.random.default_rng(7)
    B, N, C = 3, 10, 32
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    lns = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    got = fused_mlp_ln(x, w1, b1, w2, b2, lns, lnb, 1e-12, interpret=True)
    want = _mlp_ln_xla_ref(x, w1, b1, w2, b2, lns, lnb, 1e-12)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_mlp_ln_grad_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _mlp_ln_xla_ref, fused_mlp_ln
    rng = np.random.default_rng(8)
    B, N, C = 2, 8, 16
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1, jnp.float32)
    b1 = jnp.zeros((4 * C,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    lns = jnp.ones((C,), jnp.float32)
    lnb = jnp.zeros((C,), jnp.float32)

    ga = jax.grad(lambda x, w1, w2: fused_mlp_ln(
        x, w1, b1, w2, b2, lns, lnb, 1e-12, interpret=True).sum(),
        argnums=(0, 1, 2))(x, w1, w2)
    gb = jax.grad(lambda x, w1, w2: _mlp_ln_xla_ref(
        x, w1, b1, w2, b2, lns, lnb, 1e-12).sum(),
        argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_swin_attn_half_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _attn_half_xla_ref, swin_attn_half
    rng = np.random.default_rng(9)
    BW, N, C, nH = 6, 16, 32, 4
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    ln1s = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    ln1b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    got = swin_attn_half(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, bias,
                         scale, nH, interpret=True)
    want = _attn_half_xla_ref(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                              bias, scale, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_mlp_preln_matches_ref():
    from mvlt_tpu.ops.pallas_attn import _mlp_preln_xla_ref, fused_mlp_preln
    rng = np.random.default_rng(10)
    B, N, C = 3, 10, 32
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    ln2s = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    ln2b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    got = fused_mlp_preln(x, ln2s, ln2b, w1, b1, w2, b2, interpret=True)
    want = _mlp_preln_xla_ref(x, ln2s, ln2b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_half_block_path_matches_full_block_in_model():
    """SwinBlock 'interpret_half' output == plain XLA block output."""
    from flax import linen as nn
    from mvlt_tpu.models.backbones.swin import SwinBlock

    rng = np.random.default_rng(11)
    dim, res, heads = 32, (8, 8), 4

    def build(impl):
        class One(nn.Module):
            @nn.compact
            def __call__(self, x):
                return SwinBlock(dim=dim, input_resolution=res,
                                 num_heads=heads, window_size=4,
                                 shift_size=2, attn_impl=impl,
                                 name="b")(x, True)
        return One()

    x = jnp.asarray(rng.normal(size=(2, 64, dim)) * 0.5, jnp.float32)
    m_half, m_xla = build("interpret_half"), build("xla")
    v = m_half.init(jax.random.PRNGKey(0), x)
    a = m_half.apply(v, x)
    b = m_xla.apply(v, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_shift_folded_block_matches_ref():
    """Shift-folded whole block (split rel/mask bias, in-kernel permute)
    == XLA roll/partition reference."""
    from mvlt_tpu.ops.pallas_attn import (_full_xla_ref_shift,
                                          shift_kernel_feasible,
                                          swin_full_block)
    rng = np.random.default_rng(12)
    H = W = 8
    win, shift, C, nH, B = 4, 2, 16, 2, 3
    N = win * win
    nW = (H // win) * (W // win)
    assert shift_kernel_feasible(H, W, win, C, B)
    x = jnp.asarray(rng.normal(size=(B * nW, N, C)) * 0.5, jnp.float32)
    params = tuple(jnp.asarray(a, jnp.float32) for a in [
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 3 * C)) * 0.1, np.zeros(3 * C),
        rng.normal(size=(C, C)) * 0.1, np.zeros(C),
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 4 * C)) * 0.1, np.zeros(4 * C),
        rng.normal(size=(4 * C, C)) * 0.1, np.zeros(C)])
    rel = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
    scale = (C // nH) ** -0.5
    got = swin_full_block(x, params, (rel, mask), scale, nH, interpret=True,
                          shift_spec=(H, W, win, shift))
    want = _full_xla_ref_shift(x, params, (rel, mask), scale, nH,
                               (H, W, win, shift))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_mlp_chunking_exact():
    """Chunked MLP inside the shift kernel is numerically identical (the
    chunk split is a plain sum decomposition)."""
    import mvlt_tpu.ops.pallas_attn as pa
    rng = np.random.default_rng(13)
    H = W = 8
    win, shift, C, nH, B = 4, 2, 128, 4, 2
    N = win * win
    nW = (H // win) * (W // win)
    x = jnp.asarray(rng.normal(size=(B * nW, N, C)) * 0.5, jnp.float32)
    params = tuple(jnp.asarray(a, jnp.float32) for a in [
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 3 * C)) * 0.05, np.zeros(3 * C),
        rng.normal(size=(C, C)) * 0.05, np.zeros(C),
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 4 * C)) * 0.05, np.zeros(4 * C),
        rng.normal(size=(4 * C, C)) * 0.05, np.zeros(C)])
    rel = jnp.zeros((1, nH, N, N), jnp.float32)
    mask = jnp.zeros((nW, N, N), jnp.float32)
    scale = (C // nH) ** -0.5
    want = pa._full_xla_ref_shift(x, params, (rel, mask), scale, nH,
                                  (H, W, win, shift))
    got = pa.swin_full_block(x, params, (rel, mask), scale, nH,
                             interpret=True, shift_spec=(H, W, win, shift))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_block_kernel_grad_shifted_patterns():
    """Manual block backward (Pallas core VJP) with per-window bias
    patterns (shifted SW-MSA case): grads must match the XLA reference,
    including the un-merged per-pattern dbias."""
    from mvlt_tpu.ops.pallas_attn import (_block_xla_ref,
                                          window_block_attention)
    rng = np.random.default_rng(14)
    nWb, nH, N, C, B = 4, 2, 16, 16, 3
    BW = B * nWb
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nWb, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5

    g1 = jax.grad(lambda *a: window_block_attention(
        *a, scale, nH, interpret=True).sum(),
        argnums=(0, 1, 2, 3, 4, 5))(x, wqkv, bqkv, wproj, bproj, bias)
    g2 = jax.grad(lambda *a: _block_xla_ref(*a, scale, nH).sum(),
                  argnums=(0, 1, 2, 3, 4, 5))(x, wqkv, bqkv, wproj, bproj,
                                              bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_attention_core_roundtrip():
    """attention_core forward matches the einsum reference directly."""
    from mvlt_tpu.ops.pallas_attn import attention_core
    rng = np.random.default_rng(15)
    BW, N, C, nH, nWb = 4, 12, 16, 2, 2
    qkv = jnp.asarray(rng.normal(size=(BW, N, 3 * C)) * 0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nWb, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    Dh = C // nH
    got = attention_core(qkv, bias, scale, nH, interpret=True)
    q = qkv[:, :, :C].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
    k = qkv[:, :, C:2 * C].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
    v = qkv[:, :, 2 * C:].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    s = s + bias[jnp.arange(BW) % nWb]
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v).transpose(0, 2, 1, 3) \
        .reshape(BW, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_attention_core_misaligned_groups():
    """attention_core fwd+grad with MORE bias patterns than the program
    group size (merged nWb=16 > G=8): programs not aligned to an image
    boundary must still pick the right pattern (regression: the kernels
    indexed bias by the program-local window index only)."""
    from mvlt_tpu.ops.pallas_attn import _core_pick_group, attention_core_op
    rng = np.random.default_rng(17)
    BW, N, C, nH, nWb = 32, 12, 16, 2, 32
    # geometry check: after pair-merging this becomes BW=16, N=24, nWb=16
    # and the group picker must land on G < nWb for the test to bite
    G = _core_pick_group(16, 24, 3 * C, 16)
    assert G < 16, f"geometry no longer misaligned (G={G}); update shapes"
    qkv = jnp.asarray(rng.normal(size=(BW, N, 3 * C)) * 0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nWb, nH, N, N)) * 0.5, jnp.float32)
    scale = (C // nH) ** -0.5
    Dh = C // nH

    def ref(qkv, bias):
        q = qkv[:, :, :C].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
        k = qkv[:, :, C:2 * C].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
        v = qkv[:, :, 2 * C:].reshape(BW, N, nH, Dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        s = s + bias[jnp.arange(BW) % nWb]
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v).transpose(0, 2, 1, 3) \
            .reshape(BW, N, C)

    got = attention_core_op(qkv, bias, scale, nH, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(qkv, bias)),
                               atol=1e-5, rtol=1e-5)

    g1 = jax.grad(lambda q, b: attention_core_op(q, b, scale, nH, True)
                  .sum(), argnums=(0, 1))(qkv, bias)
    g2 = jax.grad(lambda q, b: ref(q, b).sum(), argnums=(0, 1))(qkv, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _mk_block_params(rng, C):
    return tuple(jnp.asarray(a, jnp.float32) for a in [
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 3 * C)) * 0.1, np.zeros(3 * C),
        rng.normal(size=(C, C)) * 0.1, np.zeros(C),
        np.ones(C), np.zeros(C),
        rng.normal(size=(C, 4 * C)) * 0.1, np.zeros(4 * C),
        rng.normal(size=(4 * C, C)) * 0.1, np.zeros(C)])


def test_full_block_grad_matches_xla():
    """swin_full_block backward (fast-core composition) == grads of the
    pure-XLA whole-block reference."""
    from mvlt_tpu.ops.pallas_attn import _full_xla_ref, swin_full_block
    rng = np.random.default_rng(16)
    BW, N, C, nH = 4, 16, 16, 2
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    g1 = jax.grad(lambda x, p, b: swin_full_block(
        x, p, b, scale, nH, interpret=True).sum(),
        argnums=(0, 1, 2))(x, params, bias)
    g2 = jax.grad(lambda x, p, b: _full_xla_ref(
        x, p, b, scale, nH).sum(), argnums=(0, 1, 2))(x, params, bias)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_full_block_droppath_multipliers():
    """dp multipliers: forward equals the reference with per-sample
    branch scaling, and grads agree with the fastcore reference."""
    from mvlt_tpu.ops.pallas_attn import (_full_ref_fastcore,
                                          swin_full_block)
    rng = np.random.default_rng(17)
    BW, N, C, nH = 4, 16, 16, 2
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    keep = 0.8
    m1 = jnp.asarray(rng.integers(0, 2, (BW * N, 1)), jnp.float32) / keep
    m2 = jnp.asarray(rng.integers(0, 2, (BW * N, 1)), jnp.float32) / keep

    got = swin_full_block(x, params, bias, scale, nH, interpret=True,
                          dp=(m1, m2))
    want = _full_ref_fastcore(x, params, bias, (m1, m2), scale, nH, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    g1 = jax.grad(lambda x, p: swin_full_block(
        x, p, bias, scale, nH, interpret=True, dp=(m1, m2)).sum(),
        argnums=(0, 1))(x, params)
    g2 = jax.grad(lambda x, p: _full_ref_fastcore(
        x, p, bias, (m1, m2), scale, nH, True).sum(),
        argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_shift_folded_block_grad_matches_ref():
    from mvlt_tpu.ops.pallas_attn import (_full_xla_ref_shift,
                                          swin_full_block)
    rng = np.random.default_rng(18)
    H = W = 8
    win, shift, C, nH, B = 4, 2, 16, 2, 2
    N = win * win
    nW = 4
    x = jnp.asarray(rng.normal(size=(B * nW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    rel = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
    scale = (C // nH) ** -0.5
    g1 = jax.grad(lambda x, p, r: swin_full_block(
        x, p, (r, mask), scale, nH, interpret=True,
        shift_spec=(H, W, win, shift)).sum(), argnums=(0, 1, 2))(
            x, params, rel)
    g2 = jax.grad(lambda x, p, r: _full_xla_ref_shift(
        x, p, (r, mask), scale, nH, (H, W, win, shift)).sum(),
        argnums=(0, 1, 2))(x, params, rel)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_shift_folded_block_droppath_per_image():
    """Shift-folded block with PER-IMAGE-CONSTANT DropPath multipliers
    (the production contract: DropPath drops whole residual branches per
    sample) == the permuting fastcore reference, fwd and grad.  The
    kernel uses dp in place — the shift permutation moves rows only
    within an image, so permuting a per-image-constant vector is the
    identity."""
    from mvlt_tpu.ops.pallas_attn import (_full_ref_fastcore,
                                          swin_full_block)
    rng = np.random.default_rng(27)
    H = W = 8
    win, shift, C, nH, B = 4, 2, 16, 2, 2
    N = win * win
    nW = 4
    x = jnp.asarray(rng.normal(size=(B * nW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    rel = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
    scale = (C // nH) ** -0.5
    keep = 0.8
    rows = nW * N

    def draw():
        m = jnp.asarray(rng.integers(0, 2, (B,)), jnp.float32) / keep
        return jnp.repeat(m, rows)[:, None]

    dp = (draw(), draw())
    spec = (H, W, win, shift)

    got = swin_full_block(x, params, (rel, mask), scale, nH,
                          interpret=True, shift_spec=spec, dp=dp)
    want = _full_ref_fastcore(x, params, (rel, mask), dp, scale, nH,
                              True, shift_spec=spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    g1 = jax.grad(lambda x, p, r: swin_full_block(
        x, p, (r, mask), scale, nH, interpret=True, shift_spec=spec,
        dp=dp).sum(), argnums=(0, 1, 2))(x, params, rel)
    g2 = jax.grad(lambda x, p, r: _full_ref_fastcore(
        x, p, (r, mask), dp, scale, nH, True, shift_spec=spec).sum(),
        argnums=(0, 1, 2))(x, params, rel)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_attn_ln_masked_variants():
    """Masked fused attention half (qbias / amask / hmask in every
    combination) == the mask-applied XLA reference, fwd and grad."""
    from mvlt_tpu.ops.pallas_attn import (_attn_ln_xla_ref,
                                          fused_attn_ln_masked)
    rng = np.random.default_rng(21)
    B, N, C, nH = 4, 13, 32, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    kbias = jnp.where(jnp.asarray(rng.random((B, N)) > 0.2), 0.0,
                      -10000.0).astype(jnp.float32)
    causal = np.triu(np.full((N, N), -10000.0), 1).astype(np.float32)
    qbias = jnp.asarray(causal)[None].repeat(B, 0)
    amask = (jnp.asarray(rng.random((B, nH, N, N)) > 0.1, jnp.float32)
             / 0.9)
    hmask = (jnp.asarray(rng.random((B, N, C)) > 0.1, jnp.float32) / 0.9)
    lns, lnb = jnp.ones(C), jnp.zeros(C)
    scale = (C // nH) ** -0.5

    for qb, am, hm in [(qbias, amask, hmask), (None, amask, None),
                       (qbias, None, None), (None, None, hmask)]:
        got = fused_attn_ln_masked(x, wqkv, bqkv, wproj, bproj, kbias, qb,
                                   am, hm, lns, lnb, scale, nH, 1e-12, 8,
                                   True)
        want = _attn_ln_xla_ref(x, wqkv, bqkv, wproj, bproj, kbias, lns,
                                lnb, scale, nH, 1e-12, qb, am, hm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
        g1 = jax.grad(lambda x_, w_: fused_attn_ln_masked(
            x_, w_, bqkv, wproj, bproj, kbias, qb, am, hm, lns, lnb,
            scale, nH, 1e-12, 8, True).sum(), argnums=(0, 1))(x, wqkv)
        g2 = jax.grad(lambda x_, w_: _attn_ln_xla_ref(
            x_, w_, bqkv, wproj, bproj, kbias, lns, lnb, scale, nH,
            1e-12, qb, am, hm).sum(), argnums=(0, 1))(x, wqkv)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)


def test_fused_mlp_ln_masked():
    from mvlt_tpu.ops.pallas_attn import (_mlp_ln_xla_ref,
                                          fused_mlp_ln_masked)
    rng = np.random.default_rng(22)
    B, N, C = 4, 13, 32
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1, jnp.float32)
    b1 = jnp.zeros(4 * C)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1, jnp.float32)
    b2 = jnp.zeros(C)
    hmask = (jnp.asarray(rng.random((B, N, C)) > 0.1, jnp.float32) / 0.9)
    lns, lnb = jnp.ones(C), jnp.zeros(C)
    got = fused_mlp_ln_masked(x, w1, b1, w2, b2, hmask, lns, lnb, 1e-12,
                              16, True)
    want = _mlp_ln_xla_ref(x, w1, b1, w2, b2, lns, lnb, 1e-12, hmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    g1 = jax.grad(lambda x_, w_: fused_mlp_ln_masked(
        x_, w_, b1, w2, b2, hmask, lns, lnb, 1e-12, 16, True).sum(),
        argnums=(0, 1))(x, w1)
    g2 = jax.grad(lambda x_, w_: _mlp_ln_xla_ref(
        x_, w_, b1, w2, b2, lns, lnb, 1e-12, hmask).sum(),
        argnums=(0, 1))(x, w1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.quick
def test_seq_core_bwd_kernel_matches_vjp():
    """seq_attention_core_bwd (interpret) == jax.vjp of the XLA attention
    core, for every qbias/amask combination, incl. the kbias cotangent."""
    from mvlt_tpu.ops.pallas_attn import seq_attention_core_bwd
    rng = np.random.default_rng(33)
    B, N, C, nH = 4, 16, 32, 4
    Dh = C // nH
    scale = Dh ** -0.5
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)) * 0.3, jnp.float32)
    dctx = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    kbias = jnp.where(jnp.asarray(rng.random((B, N)) > 0.2), 0.0,
                      -10000.0).astype(jnp.float32)
    causal = np.triu(np.full((N, N), -10000.0), 1).astype(np.float32)
    qbias = jnp.asarray(causal)[None].repeat(B, 0)
    amask = (jnp.asarray(rng.random((B, nH, N, N)) > 0.1, jnp.float32)
             / 0.9)

    def core(qkv3, kb, qb, am):
        q, k, v = (qkv3[..., i * C:(i + 1) * C]
                   .reshape(B, N, nH, Dh).transpose(0, 2, 1, 3)
                   for i in range(3))
        s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        s = s + kb[:, None, None, :]
        if qb is not None:
            s = s + qb[:, None]
        p = jax.nn.softmax(s, axis=-1)
        if am is not None:
            p = p * am
        c = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        return c.transpose(0, 2, 1, 3).reshape(B, N, C)

    for qb, am in [(None, None), (qbias, None), (None, amask),
                   (qbias, amask)]:
        _, vjp = jax.vjp(lambda a, b: core(a, b, qb, am), qkv, kbias)
        want_dqkv, want_dkb = vjp(dctx)
        got_dqkv, got_dkb = seq_attention_core_bwd(
            qkv, dctx, kbias, qb, am, scale, nH, interpret=True)
        np.testing.assert_allclose(np.asarray(got_dqkv),
                                   np.asarray(want_dqkv),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_dkb),
                                   np.asarray(want_dkb),
                                   atol=1e-3, rtol=1e-4)


@pytest.mark.quick
def test_fused_attn_ln_bf16_stored_grad():
    """bf16 stored backward (the seq-core Pallas kernel branch, interpret
    mode) tracks the f32 XLA reference within bf16 tolerances."""
    from mvlt_tpu.ops.pallas_attn import (_attn_ln_xla_ref,
                                          fused_attn_ln_masked)
    rng = np.random.default_rng(34)
    B, N, C, nH = 4, 13, 32, 4
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.bfloat16)
    bproj = jnp.zeros((C,), jnp.bfloat16)
    kbias = jnp.where(jnp.asarray(rng.random((B, N)) > 0.2), 0.0,
                      -10000.0).astype(jnp.float32)
    causal = np.triu(np.full((N, N), -10000.0), 1).astype(np.float32)
    qbias = jnp.asarray(causal)[None].repeat(B, 0)
    amask = (jnp.asarray(rng.random((B, nH, N, N)) > 0.1, jnp.float32)
             / 0.9).astype(jnp.bfloat16)
    lns, lnb = jnp.ones(C), jnp.zeros(C)
    scale = (C // nH) ** -0.5

    for qb, am in [(qbias, amask), (None, None)]:
        g1 = jax.grad(lambda x_, w_: fused_attn_ln_masked(
            x_, w_, bqkv, wproj, bproj, kbias, qb, am, None, lns, lnb,
            scale, nH, 1e-12, 8, True).astype(jnp.float32).sum(),
            argnums=(0, 1))(x, wqkv)
        g2 = jax.grad(lambda x_, w_: _attn_ln_xla_ref(
            x_.astype(jnp.float32), w_.astype(jnp.float32),
            bqkv.astype(jnp.float32), wproj.astype(jnp.float32),
            bproj.astype(jnp.float32), kbias, lns, lnb, scale, nH,
            1e-12, qb, None if am is None else am.astype(jnp.float32))
            .sum(), argnums=(0, 1))(x.astype(jnp.float32),
                                    wqkv.astype(jnp.float32))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b),
                atol=0.15, rtol=0.05)


@pytest.mark.quick
def test_swin_mlp_half_bwd_kernel():
    """swin_mlp_half_bwd (interpret) == jax.vjp of the XLA MLP-half
    formulation, with and without DropPath multipliers, incl. ddp."""
    from mvlt_tpu.ops.pallas_attn import _ln, swin_mlp_half_bwd
    rng = np.random.default_rng(41)
    M, C = 64, 32
    H = 4 * C
    dt = jnp.bfloat16
    x2 = jnp.asarray(rng.normal(size=(M, C)) * 0.5, dt)
    ctx2 = jnp.asarray(rng.normal(size=(M, C)) * 0.5, dt)
    g2 = jnp.asarray(rng.normal(size=(M, C)), dt)
    wproj = jnp.asarray(rng.normal(size=(C, C)) * 0.1, dt)
    bproj = jnp.asarray(rng.normal(size=(C,)) * 0.1, dt)
    ln2s = jnp.ones((C,), jnp.float32)
    ln2b = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.1, dt)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, dt)
    w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.1, dt)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, dt)
    dpv = (jnp.asarray(rng.random((M, 1)) > 0.3, jnp.float32) / 0.7,
           jnp.asarray(rng.random((M, 1)) > 0.3, jnp.float32) / 0.7)

    def fwd(res1_in, ln2s, ln2b, w1, b1, w2, b2, dp2):
        # out = res1 + dp2 * fc2(gelu(fc1(LN2(res1))))
        h2 = _ln(res1_in, ln2s, ln2b).astype(dt)
        m = jax.nn.gelu(
            jnp.matmul(h2, w1, preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32), approximate=False)
        mlp = jnp.matmul(m.astype(dt), w2,
                         preferred_element_type=jnp.float32) \
            + b2.astype(jnp.float32)
        if dp2 is not None:
            mlp = mlp * dp2
        return res1_in + mlp

    for dp in (None, dpv):
        dp1 = dp[0] if dp is not None else None
        attn_nodp = (jnp.matmul(ctx2, wproj,
                                preferred_element_type=jnp.float32)
                     + bproj.astype(jnp.float32))
        res1_in = x2.astype(jnp.float32) + (
            attn_nodp * dp1 if dp1 is not None else attn_nodp)
        _, vjp = jax.vjp(
            lambda r, s, bb, a1, c1, a2, c2: fwd(
                r, s, bb, a1, c1, a2, c2,
                dp[1] if dp is not None else None),
            res1_in, ln2s, ln2b, w1, b1, w2, b2)
        want = vjp(g2.astype(jnp.float32))
        w_dres1, w_dln2s, w_dln2b, w_dw1, w_db1, w_dw2, w_db2 = want

        got = swin_mlp_half_bwd(x2, ctx2, g2, wproj, bproj, ln2s, ln2b,
                                w1, b1, w2, b2, dp, interpret=True)
        dres1, dw1, db1, dw2, db2, dln2s, dln2b, ddp1, ddp2 = got
        # tolerance covers the kernel's rational-erf GELU derivative vs
        # jax.nn.gelu's exact erf on bf16 operands (tail elements of the
        # (C, 4C) weight grad land ~0.03 apart at 2e-2 nominal)
        for a, b, tol in [(dres1, w_dres1, 2e-2), (dw1, w_dw1, 5e-2),
                          (db1, w_db1, 5e-2), (dw2, w_dw2, 5e-2),
                          (db2, w_db2, 5e-2), (dln2s, w_dln2s, 2e-2),
                          (dln2b, w_dln2b, 2e-2)]:
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=tol, rtol=tol)
        if dp is not None:
            w_ddp2 = (g2.astype(jnp.float32)
                      * (res1_in + 0
                         - res1_in
                         + (fwd(res1_in, ln2s, ln2b, w1, b1, w2, b2, None)
                            - res1_in))).sum(-1, keepdims=True)
            np.testing.assert_allclose(np.asarray(ddp2),
                                       np.asarray(w_ddp2),
                                       atol=2e-2, rtol=2e-2)
            w_ddp1 = (np.asarray(dres1) * np.asarray(attn_nodp)).sum(
                -1, keepdims=True)
            np.testing.assert_allclose(np.asarray(ddp1), w_ddp1,
                                       atol=2e-2, rtol=2e-2)


@pytest.mark.quick
def test_full_block_grad_bf16_stored_kernel():
    """bf16 stored-block backward (the fused MLP-half kernel branch,
    interpret mode) tracks the f32 XLA whole-block grads within bf16
    tolerances, with and without DropPath multipliers."""
    from mvlt_tpu.ops.pallas_attn import _full_ref_fastcore, swin_full_block
    rng = np.random.default_rng(42)
    BW, N, C, nH = 4, 16, 32, 4
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.bfloat16)
    params = tuple(
        jnp.asarray(a, jnp.float32 if i in (0, 1, 6, 7) else jnp.bfloat16)
        for i, a in enumerate(_mk_block_params(rng, C)))
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    dpv = tuple(
        jnp.repeat(jnp.asarray(rng.random((BW, 1)) > 0.3,
                               jnp.float32) / 0.7, N, axis=0)
        for _ in range(2))

    for dp in (None, dpv):
        g1 = jax.grad(lambda x, p, b: swin_full_block(
            x, p, b, scale, nH, interpret=True, dp=dp)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2))(x, params, bias)
        g2 = jax.grad(lambda x, p, b: _full_ref_fastcore(
            x, p, b, dp, scale, nH, True)
            .astype(jnp.float32).sum(), argnums=(0, 1, 2))(x, params, bias)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=0.12, rtol=0.08)


@pytest.mark.quick
def test_mlp_ln_half_bwd_kernel():
    """mlp_ln_half_bwd (interpret, multi-H-chunk grid) == jax.vjp of the
    post-LN MLP-half formulation, with and without the hidden-dropout
    mask, bf16 operands."""
    from mvlt_tpu.ops.pallas_attn import _ln, mlp_ln_half_bwd
    rng = np.random.default_rng(47)
    M, C = 48, 32          # M forces row padding (48 -> 128)
    H = 4 * C
    dt = jnp.bfloat16
    x2 = jnp.asarray(rng.normal(size=(M, C)) * 0.5, dt)
    g2 = jnp.asarray(rng.normal(size=(M, C)), dt)
    w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.1, dt)
    b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, dt)
    w2 = jnp.asarray(rng.normal(size=(H, C)) * 0.1, dt)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, dt)
    lns = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    hm = (jnp.asarray(rng.random((M, C)) > 0.1, dt) / dt(0.9))

    def fwd(x2f, w1, b1, w2, b2, lns, lnb, hmask):
        m = jax.nn.gelu(
            jnp.matmul(x2f.astype(dt), w1,
                       preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32), approximate=False)
        out = jnp.matmul(m.astype(dt), w2,
                         preferred_element_type=jnp.float32) \
            + b2.astype(jnp.float32)
        if hmask is not None:
            out = out * hmask.astype(jnp.float32)
        res = out + x2f
        return _ln(res, lns, lnb, eps=1e-12), res

    for hmask in (None, hm):
        x2f = x2.astype(jnp.float32)
        (_, res2), vjp = jax.vjp(
            lambda x_, w1_, b1_, w2_, b2_, s_, b_: fwd(
                x_, w1_, b1_, w2_, b2_, s_, b_, hmask),
            x2f, w1, b1, w2, b2, lns, lnb, has_aux=False)
        want = vjp((g2.astype(jnp.float32), jnp.zeros_like(res2)))
        w_dx, w_dw1, w_db1, w_dw2, w_db2, w_dlns, w_dlnb = want

        for hc in (0, H // 4):     # auto (single chunk) and 4-chunk grid
            got = mlp_ln_half_bwd(x2, res2, g2, hmask, w1, b1, w2, lns,
                                  eps=1e-12, interpret=True, h_chunk=hc)
            dx, dw1, db1, dw2, db2, dlns, dlnb = got
            for a, b, tol in [(dx, w_dx, 3e-2), (dw1, w_dw1, 5e-2),
                              (db1, w_db1, 5e-2), (dw2, w_dw2, 5e-2),
                              (db2, w_db2, 5e-2), (dlns, w_dlns, 3e-2),
                              (dlnb, w_dlnb, 3e-2)]:
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    atol=tol, rtol=tol)


@pytest.mark.quick
def test_fused_mlp_ln_bf16_grad_kernel():
    """bf16 grads of fused_mlp_ln / fused_mlp_ln_masked (which now route
    through the mlp_ln_half_bwd kernel) track the f32 XLA reference."""
    from mvlt_tpu.ops.pallas_attn import _mlp_ln_xla_ref, fused_mlp_ln, \
        fused_mlp_ln_masked
    rng = np.random.default_rng(48)
    B, N, C = 2, 16, 32
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.5, dt)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * 0.1, dt)
    b1 = jnp.zeros((4 * C,), dt)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * 0.1, dt)
    b2 = jnp.zeros((C,), dt)
    lns, lnb = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)
    hmask = (jnp.asarray(rng.random((B, N, C)) > 0.1, dt) / dt(0.9))

    xf = x.astype(jnp.float32)

    ga = jax.grad(lambda x_, w1_, w2_: fused_mlp_ln(
        x_, w1_, b1, w2_, b2, lns, lnb, 1e-12, 16, True)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2))(x, w1, w2)
    gb = jax.grad(lambda x_, w1_, w2_: _mlp_ln_xla_ref(
        x_, w1_, b1.astype(jnp.float32), w2_, b2.astype(jnp.float32),
        lns, lnb, 1e-12).sum(), argnums=(0, 1, 2))(
            xf, w1.astype(jnp.float32), w2.astype(jnp.float32))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), atol=5e-2, rtol=5e-2)

    ga = jax.grad(lambda x_, w1_: fused_mlp_ln_masked(
        x_, w1_, b1, w2, b2, hmask, lns, lnb, 1e-12, 16, True)
        .astype(jnp.float32).sum(), argnums=(0, 1))(x, w1)
    gb = jax.grad(lambda x_, w1_: _mlp_ln_xla_ref(
        x_, w1_, b1.astype(jnp.float32), w2.astype(jnp.float32),
        b2.astype(jnp.float32), lns, lnb, 1e-12,
        hmask.astype(jnp.float32)).sum(), argnums=(0, 1))(
            xf, w1.astype(jnp.float32))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), atol=5e-2, rtol=5e-2)


@pytest.mark.quick
def test_swin_qkv_tail_bwd_kernel():
    """swin_qkv_tail_bwd (interpret) == jax.vjp of the qkv-head XLA
    formulation (LN1 + qkv projection), plus the dres1 passthrough."""
    from mvlt_tpu.ops.pallas_attn import _ln, swin_qkv_tail_bwd
    rng = np.random.default_rng(51)
    M, C = 64, 32
    dt = jnp.bfloat16
    x2 = jnp.asarray(rng.normal(size=(M, C)) * 0.5, dt)
    dqkv = jnp.asarray(rng.normal(size=(M, 3 * C)), jnp.float32)
    dres1 = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.1, dt)
    ln1s = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    ln1b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)

    def qkv_head(xf, wqkv, ln1s, ln1b):
        h1 = _ln(xf, ln1s, ln1b).astype(dt)
        return jnp.matmul(h1, wqkv, preferred_element_type=jnp.float32)

    xf = x2.astype(jnp.float32)
    _, vjp = jax.vjp(qkv_head, xf, wqkv, ln1s, ln1b)
    w_dx_h, w_dwqkv, w_dln1s, w_dln1b = vjp(dqkv)
    w_dx = w_dx_h + dres1
    w_dbqkv = dqkv.sum(0)

    dx, dwqkv, dbqkv, dln1s, dln1b = swin_qkv_tail_bwd(
        x2, dqkv, dres1, wqkv, ln1s, ln1b, interpret=True)
    for a, b, tol in [(dx, w_dx, 3e-2), (dwqkv, w_dwqkv, 5e-2),
                      (dbqkv, w_dbqkv, 1e-3), (dln1s, w_dln1s, 3e-2),
                      (dln1b, w_dln1b, 3e-2)]:
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=tol, rtol=tol)


@pytest.mark.parametrize("BW,n,C,nH,nWb", [
    (8, 49, 32, 4, 4),   # Swin-like odd-N windows: flat 2-D kernel path
    (4, 49, 32, 4, 1),   # shared bias pattern, pair-merged
    (6, 16, 24, 3, 3),   # nWb does not pair-merge (odd), unmerged flat
])
def test_attention_core_bwd_flat_matches_3d(BW, n, C, nH, nWb):
    """attention_core_bwd_flat (flat stored-residual rows, 2-D kernel)
    == attention_core_bwd (3-D kernel) — the flat path exists to avoid
    the N%8!=0 relayout copy, so it must be numerically identical."""
    from mvlt_tpu.ops.pallas_attn import (attention_core_bwd,
                                          attention_core_bwd_flat)
    rng = np.random.default_rng(23)
    qkv = jnp.asarray(rng.normal(size=(BW, n, 3 * C)) * 0.5, jnp.float32)
    dctx = jnp.asarray(rng.normal(size=(BW, n, C)) * 0.5, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nWb, nH, n, n)) * 0.3, jnp.float32)
    scale = (C // nH) ** -0.5
    want_dqkv, want_dbias = attention_core_bwd(qkv, dctx, bias, scale, nH,
                                               interpret=True)
    got_dqkv, got_dbias = attention_core_bwd_flat(
        qkv.reshape(BW * n, 3 * C), dctx.reshape(BW * n, C), bias, n,
        scale, nH, interpret=True)
    np.testing.assert_allclose(np.asarray(got_dqkv),
                               np.asarray(want_dqkv).reshape(BW * n, 3 * C),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dbias), np.asarray(want_dbias),
                               atol=1e-5, rtol=1e-5)


def test_swin_half_block_matches_xla():
    """swin_half_block (three-piece wide-C training forward + stored
    backward) == the pure-XLA whole-block reference, fwd and grads."""
    from mvlt_tpu.ops.pallas_attn import _full_xla_ref, swin_half_block
    rng = np.random.default_rng(24)
    BW, N, C, nH = 4, 16, 16, 2
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    got = swin_half_block(x, params, bias, None, scale, nH, True)
    want = _full_xla_ref(x, params, bias, scale, nH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    g1 = jax.grad(lambda x, p, b: swin_half_block(
        x, p, b, None, scale, nH, True).sum(),
        argnums=(0, 1, 2))(x, params, bias)
    g2 = jax.grad(lambda x, p, b: _full_xla_ref(
        x, p, b, scale, nH).sum(), argnums=(0, 1, 2))(x, params, bias)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_swin_half_block_droppath():
    """swin_half_block with DropPath multipliers == fastcore reference."""
    from mvlt_tpu.ops.pallas_attn import _full_ref_fastcore, swin_half_block
    rng = np.random.default_rng(25)
    BW, N, C, nH = 4, 16, 16, 2
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * 0.5, jnp.float32)
    params = _mk_block_params(rng, C)
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * 0.1, jnp.float32)
    scale = (C // nH) ** -0.5
    keep = 0.8
    m1 = jnp.asarray(rng.integers(0, 2, (BW * N, 1)), jnp.float32) / keep
    m2 = jnp.asarray(rng.integers(0, 2, (BW * N, 1)), jnp.float32) / keep
    got = swin_half_block(x, params, bias, (m1, m2), scale, nH, True)
    want = _full_ref_fastcore(x, params, bias, (m1, m2), scale, nH, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    g1 = jax.grad(lambda x, p: swin_half_block(
        x, p, bias, (m1, m2), scale, nH, True).sum(),
        argnums=(0, 1))(x, params)
    g2 = jax.grad(lambda x, p: _full_ref_fastcore(
        x, p, bias, (m1, m2), scale, nH, True).sum(),
        argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_half_train_path_in_model():
    """SwinBlock 'interpret_half' TRAINING route (drop_path=0, shifted)
    == plain XLA block output, fwd and grads."""
    from flax import linen as nn
    from mvlt_tpu.models.backbones.swin import SwinBlock

    rng = np.random.default_rng(26)
    dim, res, heads = 32, (8, 8), 4

    def build(impl):
        class One(nn.Module):
            @nn.compact
            def __call__(self, x, det):
                return SwinBlock(dim=dim, input_resolution=res,
                                 num_heads=heads, window_size=4,
                                 shift_size=2, attn_impl=impl,
                                 name="b")(x, det)
        return One()

    x = jnp.asarray(rng.normal(size=(2, 64, dim)) * 0.5, jnp.float32)
    m_half, m_xla = build("interpret_half"), build("xla")
    v = m_half.init(jax.random.PRNGKey(0), x, True)
    a = m_half.apply(v, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = m_xla.apply(v, x, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
    ga = jax.grad(lambda v, x: m_half.apply(
        v, x, False, rngs={"dropout": jax.random.PRNGKey(1)}).sum(),
        argnums=(0, 1))(v, x)
    gb = jax.grad(lambda v, x: m_xla.apply(v, x, True).sum(),
                  argnums=(0, 1))(v, x)
    for p, q in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=1e-4, rtol=1e-4)


def test_stored_p_backward_matches_recompute():
    """The stored-softmax attention-core backward (saved by the >=12-head
    whole-block save forward, consumed by ``attention_core_bwd_flat``'s
    ``p2`` path) must match the recompute backward.  f32 interpret mode
    stores p exactly, so grads agree to float tolerance."""
    import os

    import jax
    import numpy as np

    import mvlt_tpu.ops.pallas_attn as pa

    rng = np.random.default_rng(0)
    BW, N, C, nH = 8, 49, 96, 12          # 12 heads => store_p active
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * .1, jnp.float32)
    params = tuple(
        jnp.asarray(rng.normal(size=s) * .05, jnp.float32) for s in
        [(C,), (C,), (C, 3 * C), (3 * C,), (C, C), (C,), (C,), (C,),
         (C, 4 * C), (4 * C,), (4 * C, C), (C,)])
    bias = jnp.asarray(rng.normal(size=(1, nH, N, N)) * .1, jnp.float32)
    scale = (C // nH) ** -0.5

    def loss(x, params):
        out = pa.swin_full_block(x, params, bias, scale, nH,
                                 interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    grad = jax.value_and_grad(loss, argnums=(0, 1))
    os.environ["MVLT_STOREP"] = "1"           # the path is opt-in
    try:
        l_on, g_on = grad(x, params)
    finally:
        del os.environ["MVLT_STOREP"]
    l_off, g_off = grad(x, params)
    assert float(l_on) == float(l_off)
    np.testing.assert_allclose(g_on[0], g_off[0], atol=1e-4)
    for a, b in zip(g_on[1], g_off[1]):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_stored_p_backward_matches_recompute_shift():
    """Shift-folded (SW-MSA) stored-p branch: the forward stores p in
    the SHIFTED merged-pair layout and the stored backward consumes it
    after permuting its cotangents into that layout — grads must match
    the recompute backward exactly in f32 interpret mode."""
    import os

    import jax
    import numpy as np

    import mvlt_tpu.ops.pallas_attn as pa

    rng = np.random.default_rng(1)
    H = W = 14
    window, shift = 7, 3
    nW = (H // window) * (W // window)            # 4 windows, stage-3-like
    B, N, C, nH = 2, window * window, 96, 12      # 12 heads => store_p
    BW = B * nW
    assert pa.shift_kernel_feasible(H, W, window, C, B, with_dp=True)
    x = jnp.asarray(rng.normal(size=(BW, N, C)) * .1, jnp.float32)
    params = tuple(
        jnp.asarray(rng.normal(size=s) * .05, jnp.float32) for s in
        [(C,), (C,), (C, 3 * C), (3 * C,), (C, C), (C,), (C,), (C,),
         (C, 4 * C), (4 * C,), (4 * C, C), (C,)])
    rel = jnp.asarray(rng.normal(size=(1, nH, N, N)) * .1, jnp.float32)
    # SW-MSA shift-mask patterns (nW, N, N): 0 / -1e9-style separation
    mask = jnp.where(
        jnp.asarray(rng.uniform(size=(nW, N, N))) > 0.9, -100.0, 0.0
    ).astype(jnp.float32)
    scale = (C // nH) ** -0.5

    def loss(x, params):
        out = pa.swin_full_block(x, params, (rel, mask), scale, nH,
                                 interpret=True,
                                 shift_spec=(H, W, window, shift))
        return (out.astype(jnp.float32) ** 2).sum()

    grad = jax.value_and_grad(loss, argnums=(0, 1))
    os.environ["MVLT_STOREP"] = "1"
    try:
        l_on, g_on = grad(x, params)
    finally:
        del os.environ["MVLT_STOREP"]
    l_off, g_off = grad(x, params)
    assert float(l_on) == float(l_off)
    np.testing.assert_allclose(g_on[0], g_off[0], atol=1e-4)
    for a, b in zip(g_on[1], g_off[1]):
        np.testing.assert_allclose(a, b, atol=1e-4)
