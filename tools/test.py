#!/usr/bin/env python
"""Evaluation CLI.

Flag surface mirrors the reference tools/test.py:29-115 (config, checkpoint,
--eval, --show-dir analog) adapted to named dataclass configs. --synthetic
evaluates on generated data (sanity/bench); with a data root it runs the
nuScenes occupancy eval and prints the SC/SSC tables.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a Co-Occ TPU model")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="work dir containing orbax checkpoints, or a "
                   "converted .pth tree; random init if omitted")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default="data/nuscenes_infos_temporal_val.pkl")
    p.add_argument("--occ-path", default="data/nuscenes_occ")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--pred-save", default=None,
                   help="directory for per-sample npz prediction dumps")
    p.add_argument("--show-dir", default=None,
                   help="directory for BEV visualization pngs")
    p.add_argument("--save-by-scene", action="store_true",
                   help="group --pred-save npz dumps into per-scene "
                   "subfolders named by real sample tokens, ready for "
                   "tools/visualize_video.py (reference: per-scene pred "
                   "folders, visualize_nusc_video.py:56-76)")
    p.add_argument("--test-rendering", action="store_true",
                   help="render rgb/depth at eval and report PSNR/SSIM "
                   "(reference: test_rendering=True, coocc_ray.py:562-637)")
    p.add_argument("--render-dir", default=None,
                   help="dump [render | gt | depth] side-by-side pngs here "
                   "(implies --test-rendering)")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from coocc_tpu.config import get_config
    from coocc_tpu.config.nuscenes import NUSC_CLASS_NAMES
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.parallel.mesh import make_mesh
    from coocc_tpu.train.checkpoint import CheckpointManager
    from coocc_tpu.train.loop import evaluate
    from coocc_tpu.evaluation.formatting import print_ssc_table

    cfg = tiny_config() if args.config == "tiny" else get_config(args.config)
    if args.test_rendering or args.render_dir:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, use_rendering=True,
                                            test_rendering=True))
    mesh = make_mesh(args.devices)
    n_dev = mesh.devices.size
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
        cfg.compute_dtype)
    model = CoOccRay(cfg=cfg, dtype=dtype)

    def to_dev(b):
        return jax.tree.map(
            lambda x: None if x is None else jnp.asarray(x), b,
            is_leaf=lambda x: x is None)

    if args.synthetic:
        def val_iter():
            for i in range(args.max_steps or 2):
                yield to_dev(synthetic_batch(cfg, batch_size=n_dev,
                                             seed=2000 + i))
    else:
        from coocc_tpu.data.nuscenes_dataset import build_loaders
        _, val_iter, _ = build_loaders(
            cfg, args.data_root, args.ann_file, args.ann_file,
            args.occ_path, batch_size=n_dev)

    sample = next(iter(val_iter()))
    if args.checkpoint:
        if args.checkpoint.endswith(".pth"):
            from coocc_tpu.train.convert_torch import load_torch_checkpoint
            variables = load_torch_checkpoint(args.checkpoint, model, sample)
        else:
            ckpt = CheckpointManager(args.checkpoint)
            tree, _ = ckpt.restore()
            state = tree["state"]
            variables = {"params": state["params"]}
            if state.get("batch_stats") is not None:
                variables["batch_stats"] = state["batch_stats"]
    else:
        from coocc_tpu.utils.init_utils import jit_init
        variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, sample,
                             train=False)

    if args.pred_save or args.show_dir:
        # per-sample loop with prediction dumps (reference: --pred-save /
        # --show-dir in tools/test.py + apis/utils.py savers)
        import numpy as np
        from coocc_tpu.evaluation.savers import save_output_nuscenes
        from coocc_tpu.evaluation.visualize import save_visualization
        from coocc_tpu.parallel.train_step import make_eval_step
        eval_step = make_eval_step(model, cfg, mesh=mesh)
        out_dir = args.pred_save or args.show_dir
        # val iteration is sequential over the timestamp-sorted infos, so
        # flat index -> (token, scene_name) comes straight from the pkl
        meta = None
        if args.save_by_scene and not args.synthetic:
            import pickle
            with open(args.ann_file, "rb") as f:
                data = pickle.load(f)
            infos = data["infos"] if isinstance(data, dict) else data
            infos = sorted(infos, key=lambda x: x["timestamp"])
            meta = [(x["token"], x.get("scene_name")) for x in infos]
        for i, batch in enumerate(val_iter()):
            if args.max_steps and i >= args.max_steps:
                break
            out = eval_step(variables, batch)
            pred = np.argmax(np.asarray(out["occ_logits"]), axis=-1)
            for b in range(pred.shape[0]):
                flat = i * pred.shape[0] + b
                token, scene = (meta[flat] if meta and flat < len(meta)
                                else (f"sample_{i}_{b}", None))
                save_output_nuscenes(
                    pred[b], args.pred_save or out_dir, token,
                    gt_voxels=np.asarray(batch.gt_occ[b]),
                    scene_name=scene)
                if args.show_dir:
                    import os
                    save_visualization(
                        os.path.join(args.pred_save or out_dir,
                                     *([scene] if scene else []),
                                     f"{token}.npz"),
                        os.path.join(args.show_dir, f"{token}.png"))

    metrics = evaluate(model, variables, cfg, val_iter(), mesh=mesh,
                       max_steps=args.max_steps, render_dir=args.render_dir)
    print_ssc_table(metrics, NUSC_CLASS_NAMES)


if __name__ == "__main__":
    main()
