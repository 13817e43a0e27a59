#!/usr/bin/env python
"""Training CLI.

Flag surface mirrors the reference tools/train.py:32-98 (config, --work-dir,
--resume-from, --seed, --deterministic, --cfg-options) adapted to named
dataclass configs. With --synthetic the loop runs on generated data (no
dataset in this environment); otherwise point --data-root at a prepared
nuScenes tree.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a Co-Occ TPU model")
    p.add_argument("config", help="config name, e.g. coocc_multi_r50_256x704, "
                   "or 'tiny' for the synthetic miniature config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None,
                   help="work dir to resume from (latest epoch)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke/bench)")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default="data/nuscenes_infos_temporal_train.pkl")
    p.add_argument("--val-ann-file", default="data/nuscenes_infos_temporal_val.pkl")
    p.add_argument("--occ-path", default="data/nuscenes_occ")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="key=value overrides on the top-level config")
    # multi-host launch (tools/dist_train.sh; reference dist_train.sh:1-17)
    p.add_argument("--dist-coordinator", default=None,
                   help="coordinator host:port for jax.distributed")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    return p.parse_args()


def apply_overrides(cfg, options):
    import ast
    for opt in options:
        k, v = opt.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        cfg = cfg.replace(**{k: v})
    return cfg


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if args.dist_num_processes:
        from coocc_tpu.parallel.distributed import init_distributed
        init_distributed(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.parallel.mesh import make_mesh
    from coocc_tpu.train.loop import train

    if args.config == "tiny":
        cfg = tiny_config()
    else:
        cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.cfg_options)
    if args.max_epochs is not None:
        cfg = cfg.replace(optim=cfg.optim.__class__(
            **{**cfg.optim.__dict__, "max_epochs": args.max_epochs}))

    mesh = make_mesh(args.devices)
    n_dev = mesh.devices.size
    work_dir = args.work_dir or os.path.join("work_dirs", cfg.name)

    def to_dev(b):
        return jax.tree.map(
            lambda x: None if x is None else jnp.asarray(x), b,
            is_leaf=lambda x: x is None)

    if args.synthetic:
        steps = args.steps_per_epoch or 10

        def train_iter():
            for i in range(steps):
                yield to_dev(synthetic_batch(cfg, batch_size=n_dev, seed=i))

        def val_iter():
            for i in range(2):
                yield to_dev(synthetic_batch(cfg, batch_size=n_dev,
                                             seed=1000 + i))
    else:
        from coocc_tpu.data.nuscenes_dataset import build_loaders
        train_iter, val_iter, steps = build_loaders(
            cfg, args.data_root, args.ann_file, args.val_ann_file,
            args.occ_path, batch_size=n_dev)
        steps = args.steps_per_epoch or steps

    dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
        cfg.compute_dtype)
    model = CoOccRay(cfg=cfg, dtype=dtype)
    train(model, cfg, train_iter, val_iter, steps_per_epoch=steps,
          work_dir=work_dir, mesh=mesh,
          resume=args.resume_from is not None, seed=args.seed,
          eval_max_steps=4 if args.synthetic else None)


if __name__ == "__main__":
    main()
