"""Panoptic voxel-GT loader vs hand-computed oracle."""
import numpy as np

from coocc_tpu.data.pipelines.load_occupancy import load_panoptic_voxel_gt


def test_panoptic_vote_semantics():
    pc_range = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)
    vs = (1.0, 1.0, 1.0)
    grid = (4, 4, 2)
    lm = {17: 4, 24: 11, 0: 0}
    pts = np.array([
        [0.5, 0.5, 0.5],   # voxel (0,0,0) car inst 1
        [0.6, 0.4, 0.2],   # same voxel, car inst 1 again
        [0.2, 0.8, 0.9],   # same voxel, stuff 24 (outvoted 2-1)
        [1.5, 0.5, 0.5],   # voxel (1,0,0) noise only -> ignore
        [2.5, 2.5, 1.5],   # voxel (2,2,1) stuff 24
        [9.0, 9.0, 9.0],   # clipped into the border voxel (3,3,1)
    ], np.float32)
    labels = np.array([17001, 17001, 24000, 0, 24000, 24000], np.int64)

    out = load_panoptic_voxel_gt(pts, labels, lm, pc_range, vs, grid)
    assert out.shape == (4, 4, 2)
    assert out[0, 0, 0] == 4001          # mapped car*1000 + inst 1
    assert out[1, 0, 0] == 65535         # noise-only -> ignore
    assert out[2, 2, 1] == 11000         # stuff keeps instance 0
    assert out[3, 3, 1] == 11000         # clipped point lands on border
    assert out[0, 1, 0] == 0             # empty -> free
