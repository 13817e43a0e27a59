import numpy as np

from coocc_tpu.evaluation.panoptic import PanopticEvaluator


def test_perfect_panoptic():
    ev = PanopticEvaluator(num_classes=3)
    sem = np.array([1, 1, 1, 2, 2, 0, 0])
    inst = np.array([5, 5, 5, 7, 7, 0, 0])
    ev.add_batch(sem, inst, sem, inst)
    m = ev.compute()
    assert m["PQ"] == 1.0 and m["SQ"] == 1.0 and m["RQ"] == 1.0


def test_partial_match():
    ev = PanopticEvaluator(num_classes=2)
    gt_sem = np.array([1] * 10)
    gt_inst = np.array([1] * 10)
    pred_sem = np.array([1] * 10)
    pred_inst = np.array([1] * 6 + [2] * 4)  # split into two segments
    ev.add_batch(pred_sem, pred_inst, gt_sem, gt_inst)
    m = ev.compute()
    # seg 1 matches with IoU 0.6 (tp), seg 2 unmatched (fp)
    assert 0 < m["PQ"] < 1
    assert abs(m["RQ"] - (1 / (1 + 0.5))) < 1e-6
    assert abs(m["SQ"] - 0.6) < 1e-6
