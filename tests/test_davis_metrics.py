"""DAVIS J&F metrics against hand-computable masks + the saved-PNG
dataset harness (round-1 VERDICT item 5: the metric that defines
parity was untested)."""

import numpy as np

from rvos_tpu.utils.davis_metrics import (
    evaluate_dataset_jf,
    evaluate_sequence,
    f_measure,
    jaccard,
    mean_jf,
)


def _band(h, w, r0, r1):
    m = np.zeros((h, w), bool)
    m[r0:r1] = True
    return m


def test_jaccard_hand_values():
    a = _band(32, 32, 10, 20)
    assert jaccard(a, a) == 1.0
    assert jaccard(a, ~a) == 0.0
    assert jaccard(np.zeros((8, 8)), np.zeros((8, 8))) == 1.0   # empty∩empty
    # 10-row band shifted by 1: inter 9 rows, union 11 rows
    b = _band(32, 32, 11, 21)
    assert abs(jaccard(a, b) - 9.0 / 11.0) < 1e-9


def test_f_measure_hand_values():
    a = _band(32, 32, 10, 20)
    assert f_measure(a, a) == 1.0
    # fully disjoint far-apart masks
    c = _band(32, 32, 0, 2)
    d = _band(32, 32, 28, 30)
    assert f_measure(c, d) == 0.0
    # band shifted by 1 px: every boundary pixel within distance 1 of the
    # other mask's boundary; tolerance radius = ceil(0.008 * diag(32,32))
    # = 1, so F must be exactly 1.0 while J is 9/11
    b = _band(32, 32, 11, 21)
    assert f_measure(a, b) == 1.0
    # empty prediction vs non-empty GT
    assert f_measure(np.zeros((32, 32)), a) == 0.0


def test_evaluate_sequence_excludes_endpoints():
    """DAVIS convention: first/last frames excluded when len > 2."""
    h = w = 16
    gt = np.zeros((h, w), np.uint8)
    gt[4:12, 4:12] = 1
    wrong = np.zeros_like(gt)
    # wrong on endpoints only → perfect score
    per_obj = evaluate_sequence([wrong, gt, gt, wrong],
                                [gt, gt, gt, gt], [1])
    assert per_obj[1]["J"] == 1.0 and per_obj[1]["F"] == 1.0
    s = mean_jf(per_obj)
    assert s["J&F"] == 1.0


def test_evaluate_dataset_jf_roundtrip(tmp_path):
    """eval→PNG→J&F round-trip through the palette-PNG harness."""
    from rvos_tpu.utils.image import save_mask

    gt = np.zeros((32, 32), np.uint8)
    gt[8:16, 8:24] = 1
    gt[20:28, 4:12] = 2
    shifted = np.roll(gt, 1, axis=0)

    for seq, masks in (("perfect", [gt, gt, gt]),
                       ("shifted", [gt, shifted, gt])):
        for root, arrs in (("res", masks), ("gt", [gt] * 3)):
            d = tmp_path / root / seq
            d.mkdir(parents=True, exist_ok=True)
            for i, m in enumerate(arrs):
                save_mask(m, str(d / f"{i:05d}.png"))

    out = evaluate_dataset_jf(str(tmp_path / "res"), str(tmp_path / "gt"))
    assert out["per_seq"]["perfect"]["J&F"] == 1.0
    assert out["per_seq"]["shifted"]["J&F"] < 1.0
    assert out["per_seq"]["shifted"]["J"] > 0.5      # 1-px shift, not garbage
    assert 0.5 < out["J&F"] < 1.0
