"""Orbax checkpoint save/restore round trip + best tracking."""
import numpy as np
import jax.numpy as jnp

from coocc_tpu.train.checkpoint import CheckpointManager


def test_roundtrip_and_best(tmp_path, rng):
    ckpt = CheckpointManager(str(tmp_path), max_keep=1)
    tree0 = {"state": {"params": {"w": np.arange(6, dtype=np.float32)},
                       "step": np.int32(10)}, "epoch": 0}
    ckpt.save(tree0, 0, metrics={"SSC_mIoU": 0.10})

    tree1 = {"state": {"params": {"w": np.arange(6, dtype=np.float32) * 2},
                       "step": np.int32(20)}, "epoch": 1}
    ckpt.save(tree1, 1, metrics={"SSC_mIoU": 0.30})

    tree2 = {"state": {"params": {"w": np.arange(6, dtype=np.float32) * 3},
                       "step": np.int32(30)}, "epoch": 2}
    ckpt.save(tree2, 2, metrics={"SSC_mIoU": 0.20})

    restored, epoch = ckpt.restore()
    assert epoch == 2
    np.testing.assert_array_equal(restored["state"]["params"]["w"],
                                  tree2["state"]["params"]["w"])

    best = ckpt.restore_best()
    np.testing.assert_array_equal(best["state"]["params"]["w"],
                                  tree1["state"]["params"]["w"])

    # max_keep=1: only the newest epoch dir remains (plus best/)
    import os
    dirs = [d for d in os.listdir(tmp_path) if d.startswith("epoch_")]
    assert dirs == ["epoch_2"], dirs
