#!/usr/bin/env python
"""Iterate the data pipeline standalone and dump statistics/visualizations.

Capability parity with the reference's tools/debug_dataset.py:1-196
(pipeline-only iteration + visualization without building a model).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="coocc_multi_r50_256x704")
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--ann-file", default="data/nuscenes_infos_temporal_train.pkl")
    p.add_argument("--occ-path", default="data/nuscenes_occ")
    p.add_argument("--num-samples", type=int, default=5)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    from coocc_tpu.config import get_config
    from coocc_tpu.data.synthetic import synthetic_batch, tiny_config

    cfg = tiny_config() if args.config == "tiny" else get_config(args.config)

    if args.synthetic:
        samples = (synthetic_batch(cfg, 1, seed=i)._asdict()
                   for i in range(args.num_samples))
    else:
        from coocc_tpu.data.nuscenes_dataset import NuScenesOccDataset
        ds = NuScenesOccDataset(cfg, args.data_root, args.ann_file,
                                args.occ_path, is_train=True)
        samples = (ds.get_sample(i, np.random.RandomState(i))
                   for i in range(min(args.num_samples, len(ds))))

    for i, s in enumerate(samples):
        t0 = time.time()
        stats = {}
        for k, v in s.items():
            if v is None:
                continue
            v = np.asarray(v)
            stats[k] = f"{v.shape} {v.dtype} [{v.min():.3g}, {v.max():.3g}]"
        print(f"sample {i} ({time.time() - t0:.2f}s):")
        for k, v in stats.items():
            print(f"  {k}: {v}")
        gt = np.asarray(s["gt_occ"])
        occ = ((gt > 0) & (gt != 255)).mean()
        print(f"  occupancy: {occ:.3%}, ignore: {(gt == 255).mean():.3%}")
        if args.save_dir:
            from coocc_tpu.evaluation.visualize import bev_image
            from PIL import Image
            os.makedirs(args.save_dir, exist_ok=True)
            img = bev_image(gt if gt.ndim == 3 else gt[0])
            Image.fromarray(np.transpose(img, (1, 0, 2))[::-1]).save(
                os.path.join(args.save_dir, f"gt_bev_{i}.png"))


if __name__ == "__main__":
    main()
