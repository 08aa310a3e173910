"""A/B: merge-2 (production) vs merge-4 window grouping in the Swin
whole-block forward + bwd core, per stage (b32, bf16).

Merge-4 quadruples the block-diagonal attend tile (196x196) halving the
per-head call count at 2x the score flops — wins iff the attend loop is
call-overhead-bound (stage-1/2/3 hypothesis).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import mvlt_tpu.ops.pallas_attn as pa

real_pairs = pa._merge_window_pairs
real_bias = pa._merge_bias_pairs


def _merge_bias_k(bias, k):
    nWb, nH, N, _ = bias.shape
    out_n = 1 if nWb == 1 else nWb // k
    neg = jnp.full((out_n, nH, k * N, k * N), -1e9, bias.dtype)
    for j in range(k):
        blk = bias if nWb == 1 else bias.reshape(nWb // k, k, nH, N, N)[:, j]
        neg = neg.at[:, :, j * N:(j + 1) * N, j * N:(j + 1) * N].set(blk)
    return neg


def merge4(x, bias):
    BW, N, C = x.shape
    nWb = bias.shape[0]
    k = 4
    if N > 64 or BW % k != 0 or (nWb > 1 and nWb % k != 0):
        return real_pairs(x, bias)
    return x.reshape(BW // k, k * N, C), _merge_bias_k(bias, k), True


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_stage3 import run  # reuse harness

    stage = os.environ.get("STAGE", "3")
    print(f"merge-4 A/B, stage {stage}")
    run("merge-2 (production)", "auto")
    pa._merge_window_pairs = merge4
    try:
        run("merge-4 fwd", "auto")
    finally:
        pa._merge_window_pairs = real_pairs
