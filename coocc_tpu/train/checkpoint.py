"""Orbax checkpoint save/restore + best-metric tracking.

Capability parity with mmcv CheckpointHook + OccDistEvalHook
(reference: coocc_multi_r50_256x704.py:287-295 — every epoch,
max_keep_ckpts=1, save_best='SSC_mean'; resume restores optimizer + epoch,
apis/mmdet_train.py:195-198). TPU-native: a single orbax PyTree checkpoint
holds params, optimizer state, batch_stats and step/epoch counters.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, work_dir: str, max_keep: int = 1):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)
        self.max_keep = max_keep
        self._ckpt = ocp.PyTreeCheckpointer()
        self._meta_path = os.path.join(self.work_dir, "ckpt_meta.json")

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.work_dir, f"epoch_{epoch}")

    def save(self, state_tree: Any, epoch: int,
             metrics: Optional[Dict[str, float]] = None,
             best_key: str = "SSC_mIoU"):
        path = self._epoch_dir(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, state_tree)

        meta = self._load_meta()
        meta["last_epoch"] = epoch
        meta.setdefault("epochs", []).append(epoch)
        if metrics:
            meta.setdefault("metrics", {})[str(epoch)] = metrics
            best = meta.get("best", {"value": -np.inf})
            if metrics.get(best_key, -np.inf) > best.get("value", -np.inf):
                meta["best"] = {"epoch": epoch, "key": best_key,
                                "value": metrics[best_key]}
                best_path = os.path.join(self.work_dir, "best")
                if os.path.exists(best_path):
                    shutil.rmtree(best_path)
                shutil.copytree(path, best_path)
        self._save_meta(meta)

        # keep only the newest max_keep epoch dirs (best/ is kept separately)
        for old in sorted(meta["epochs"])[:-self.max_keep]:
            p = self._epoch_dir(old)
            if os.path.exists(p):
                shutil.rmtree(p)

    def restore(self, epoch: Optional[int] = None, target: Any = None):
        meta = self._load_meta()
        if epoch is None:
            epoch = meta.get("last_epoch")
            if epoch is None:
                return None, None
        tree = self._ckpt.restore(self._epoch_dir(epoch), item=target)
        return tree, epoch

    def restore_best(self, target: Any = None):
        path = os.path.join(self.work_dir, "best")
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path, item=target)

    def _load_meta(self) -> Dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}

    def _save_meta(self, meta: Dict):
        with open(self._meta_path, "w") as f:
            json.dump(meta, f, indent=2, default=float)
