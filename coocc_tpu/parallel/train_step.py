"""jit-compiled data-parallel train/eval steps.

Replaces the reference's DDP + EpochBasedRunner iteration
(apis/mmdet_train.py:95-199, mmcv OptimizerHook): one jitted function does
forward, loss, grad, clip, AdamW update. Under a sharded batch the compiler
inserts the gradient all-reduce (the NCCL allreduce equivalent) — nothing to
hand-write. Eval steps return confusion matrices, which are summed on host
across steps and psum'd across processes by virtue of being tiny arrays.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config.base import CoOccConfig
from ..evaluation.ssc_metrics import occupancy_hists
from ..models.losses import compute_losses
from .mesh import Mesh, NamedSharding, P


def make_train_step(model, cfg: CoOccConfig, mesh=None):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(variables, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, 1)}
        outs, mutated = model.apply(
            variables, batch, train=True,
            fine_rng=jax.random.fold_in(rng, 2), rngs=rngs,
            mutable=["batch_stats"] if "batch_stats" in variables else [])
        # optimization_barrier between the model outputs and the loss
        # computation. NOT cosmetic: on the TPU backend (v5e, jax 0.9.0)
        # the fused fwd+bwd train graph returns NaN for exactly the voxel
        # loss terms at step 0 while the identical math is clean on CPU,
        # clean as a fwd-only graph, and clean when the grads are returned
        # without the optimizer update (round-4 bisect, five single-delta
        # probes). Severing fusion at this boundary fixes every variant;
        # the outputs are loss inputs either way, so the barrier
        # materializes nothing the graph wasn't already keeping.
        keys = [k for k, v in outs.items() if v is not None]
        vals = jax.lax.optimization_barrier(tuple(outs[k] for k in keys))
        outs = {**outs, **dict(zip(keys, vals))}
        losses = compute_losses(outs, batch, cfg)
        total = sum(v for k, v in losses.items() if k.startswith("loss"))
        return total, (losses, mutated.get("batch_stats"))

    def grads_and_aux(params, batch_stats, batch, rng):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        (total, aux), gvars = jax.value_and_grad(
            loss_fn, has_aux=True)(variables, batch, rng)
        return total, aux, gvars["params"]

    def train_step(state, batch, rng):
        total, (losses, new_bs), grads = grads_and_aux(
            state.params, state.batch_stats, batch, rng)
        state = state.apply_gradients(grads=grads)
        if new_bs is not None:
            state = state.replace(batch_stats=new_bs)
        metrics = {"loss_total": total, **losses}
        return state, metrics

    if mesh is not None:
        # shard_map the grad computation over the data axis: the per-device
        # program is batch-size B/n_devices (=1 at reference batching) no
        # matter the mesh size — compile time and HLO size stay CONSTANT as
        # devices scale, unlike GSPMD batch-sharding of a B-unrolled model.
        # Gradients are pmean'd explicitly (the NCCL allreduce equivalent);
        # BatchNorms traced under bn_sync_axis psum their batch statistics
        # (TPU-native SyncBN, reference tools/train.py:222-223).
        from ..nn.layers import bn_sync_axis

        axis = mesh.axis_names[0]

        def per_device_grads(params, batch_stats, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            with bn_sync_axis(axis):
                total, (losses, new_bs), grads = grads_and_aux(
                    params, batch_stats, batch, rng)
            grads = jax.lax.pmean(grads, axis)
            total = jax.lax.pmean(total, axis)
            losses = jax.lax.pmean(losses, axis)
            if new_bs is not None:
                # already identical across devices when every norm synced;
                # pmean guards any stat that wasn't traced under the context
                new_bs = jax.lax.pmean(new_bs, axis)
            return total, losses, new_bs, grads

        sharded_grads = jax.shard_map(
            per_device_grads, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )

        def train_step_sm(state, batch, rng):
            total, losses, new_bs, grads = sharded_grads(
                state.params, state.batch_stats, batch, rng)
            state = state.apply_gradients(grads=grads)
            if new_bs is not None:
                state = state.replace(batch_stats=new_bs)
            metrics = {"loss_total": total, **losses}
            return state, metrics

        repl = NamedSharding(mesh, P())
        return jax.jit(
            train_step_sm,
            in_shardings=(repl, NamedSharding(mesh, P(axis)), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, cfg: CoOccConfig, mesh=None, return_logits=True):
    """Returns eval_step(variables, batch) -> dict of hists (+ logits).

    return_logits=False drops the full occ/fine logits from the outputs so
    the metric-only eval loop transfers just the tiny confusion matrices.
    """

    def eval_step(variables, batch):
        outs = model.apply(variables, batch, train=False)
        sc, ssc = occupancy_hists(outs["occ"], batch.gt_occ,
                                  cfg.num_classes, cfg.empty_idx)
        res = {"SC_hist": sc, "SSC_hist": ssc}
        if batch.visible_mask is not None:
            # masked SSC over camera/lidar-visible voxels (reference
            # hist_occ, coocc_ray_lidar.py:700-707; OpenOccupancy protocol)
            sc_v, ssc_v = occupancy_hists(
                outs["occ"], batch.gt_occ, cfg.num_classes, cfg.empty_idx,
                extra_mask=batch.visible_mask)
            res["SC_hist_visible"] = sc_v
            res["SSC_hist_visible"] = ssc_v
        if "render_depth" in outs:
            # test-rendering path (cfg.render.test_rendering=True): expose
            # the rendered maps so the host can compute PSNR/SSIM and dump
            # side-by-sides (reference: coocc_ray.py:562-637)
            res["render_depth"] = outs["render_depth"]
            if outs.get("render_rgb") is not None:
                res["render_rgb"] = outs["render_rgb"]
        if return_logits:
            res["occ_logits"] = outs["occ"]
        if "fine_overflow" in outs:
            res["fine_overflow"] = outs["fine_overflow"]
        if "fine_logits" in outs and return_logits:
            res["fine_logits"] = outs["fine_logits"]
            res["fine_coords"] = outs["fine_coords"]
            res["fine_valid"] = outs["fine_valid"]
        if "fine_logits" in outs:
            # fine-cascade SSC metric: scatter fine logits into an
            # empty-initialized full-res grid (reference: simple_test
            # pred_f assembly + SSC_metric_fine, coocc_ray.py:545-554)
            from ..evaluation.ssc_metrics import scatter_fine_into_pred
            pred_f = scatter_fine_into_pred(
                outs["fine_logits"], outs["fine_coords"], outs["fine_valid"],
                cfg.occ_head.final_occ_size, cfg.empty_idx)
            sc_f, ssc_f = occupancy_hists(pred_f, batch.gt_occ,
                                          cfg.num_classes, cfg.empty_idx)
            res["SC_hist_fine"] = sc_f
            res["SSC_hist_fine"] = ssc_f
        if batch.points_occ is not None:
            # lidarseg readout + confusion matrix
            # (reference: occ_head.py:339-379, coocc_ray.py:556-560)
            from ..evaluation.ssc_metrics import lidarseg_hist
            from ..nn.occ_head import forward_lidarseg
            pl = forward_lidarseg(outs["occ"], batch.points_occ,
                                  batch.points_occ_mask,
                                  cfg.point_cloud_range)
            labels = batch.points_occ[..., -1].astype(jnp.int32)
            res["lidarseg_hist"] = lidarseg_hist(
                pl, labels, batch.points_occ_mask, cfg.num_classes)
        return res

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        return jax.jit(
            eval_step,
            in_shardings=(repl, NamedSharding(mesh, P("data"))),
        )
    return jax.jit(eval_step)
