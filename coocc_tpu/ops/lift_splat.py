"""LSS lift-splat as a fused scatter-add (TPU-native bev_pool).

Replaces the reference's CUDA bev_pool interval-sum kernel
(reference: mmdetection3d/mmdet3d/ops/bev_pool/bev_pool.py:37-97 and
src/bev_pool_cuda.cu) with an XLA design that never materializes the
[B, N, D, fH, fW, C] outer-product volume the torch path builds
(ViewTransformerLSSVoxel.py:136-145):

    out[b, v, :] = sum_{p in frustum, voxel(p)=v} depth_prob[p] * img_feat[pixel(p), :]

The frustum point -> voxel assignment comes from geometry only, so the heavy
[P, C] feature gather is fused with the depth weighting and reduced with a
sorted segment-sum (monotonic segment ids -> efficient TPU lowering, no
atomics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.frustum import voxel_indices
from .voxelize import linearize


def lift_splat(depth_prob: jnp.ndarray, img_feat: jnp.ndarray,
               geom: jnp.ndarray, dx, bx, nx, *,
               sort: bool = True) -> jnp.ndarray:
    """Splat per-pixel depth-weighted image features into the voxel grid.

    Args:
      depth_prob: [B, N, D, fH, fW] softmax depth distribution.
      img_feat:   [B, N, fH, fW, C] image context features (channels-last).
      geom:       [B, N, D, fH, fW, 3] ego-frame frustum points.
      dx, bx, nx: voxel grid spec (see geometry.frustum.gen_dx_bx).
      sort:       sort points by voxel id for a sorted segment-sum
                  (faster on TPU than scatter-add with random indices).

    Returns: [B, X, Y, Z, C] voxel features.
    """
    B, N, D, fH, fW = depth_prob.shape
    C = img_feat.shape[-1]
    nx_i = [int(v) for v in nx]
    n_vox = nx_i[0] * nx_i[1] * nx_i[2]
    P = N * D * fH * fW

    idx, valid = voxel_indices(geom, dx, bx, nx)  # [B,N,D,fH,fW,3], bool
    vox_id = linearize(idx, nx_i)
    vox_id = jnp.where(valid, vox_id, n_vox).reshape(B, P)

    w = depth_prob.reshape(B, P)
    # pixel index of each frustum point into the [N*fH*fW, C] feature table
    pix = (
        jnp.arange(N)[:, None, None, None] * (fH * fW)
        + jnp.arange(fH)[None, None, :, None] * fW
        + jnp.arange(fW)[None, None, None, :]
    )
    pix = jnp.broadcast_to(pix, (N, D, fH, fW)).reshape(P)

    def one_sample(wb, vb, fb):
        # gather the features in their own (bf16) dtype and upcast AFTER:
        # identical values to upcasting first, half the gather traffic
        feats = fb.reshape(N * fH * fW, C)
        if sort:
            # one multi-operand lax.sort carrying weight + pixel payloads:
            # measured 4x faster than argsort + permutation gathers, which
            # XLA fuses pathologically (21.7 -> 5.5 ms at the r50 shapes)
            vb_s, w_s, pix_s = jax.lax.sort(
                (vb, wb, jnp.broadcast_to(pix, wb.shape)), num_keys=1)
            contrib = feats[pix_s].astype(wb.dtype) * w_s[:, None]
            out = jax.ops.segment_sum(
                contrib, vb_s, num_segments=n_vox + 1,
                indices_are_sorted=True,
            )
        else:
            contrib = feats[pix].astype(wb.dtype) * wb[:, None]
            out = jax.ops.segment_sum(contrib, vb, num_segments=n_vox + 1)
        return out[:n_vox].reshape(nx_i[0], nx_i[1], nx_i[2], C)

    # NOT vmap: a vmapped lax.sort lowers to a batched sort that costs
    # 13.1 ms where the unbatched one costs 5.4 ms at the r50 shapes.
    # B == 1 (the deployment batching) keeps the bare unbatched lowering;
    # B > 1 runs the same per-sample program under lax.map so the traced
    # HLO stays CONSTANT-SIZE in B instead of unrolling (bit-identical
    # output either way).
    if B == 1:
        return one_sample(w[0], vox_id[0], img_feat[0])[None]
    return jax.lax.map(lambda a: one_sample(*a), (w, vox_id, img_feat))
