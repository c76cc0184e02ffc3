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


def _bruteforce_f(pred, gt, bound_th=0.008):
    """Independent re-implementation of the toolkit's db_eval_boundary:
    per-pixel-loop seg2bmap + explicit Euclidean distance matching
    (no dilation) — O(N·boundary), fine on tiny masks.  Used to
    cross-check the production implementation on non-trivial masks
    (VERDICT r3 weak #5)."""
    def bmap(seg):
        s = seg.astype(bool)
        h, w = s.shape
        b = np.zeros((h, w), bool)
        for y in range(h):
            for x in range(w):
                ee = s[y, x + 1] if x + 1 < w else s[y, x]
                ss = s[y + 1, x] if y + 1 < h else s[y, x]
                if y + 1 < h and x + 1 < w:
                    sse = s[y + 1, x + 1]
                elif y + 1 < h:      # last column: toolkit compares s only
                    sse = s[y, x]
                elif x + 1 < w:      # last row: toolkit compares e only
                    sse = s[y, x]
                else:
                    sse = s[y, x]
                b[y, x] = (s[y, x] ^ ee) or (s[y, x] ^ ss) or (s[y, x] ^ sse)
        b[-1, -1] = False
        return b

    r = bound_th if bound_th >= 1 else np.ceil(
        bound_th * np.linalg.norm(pred.shape))
    pb, gb = bmap(pred), bmap(gt)
    pc = np.argwhere(pb)
    gc = np.argwhere(gb)
    n_p, n_g = len(pc), len(gc)
    if n_p == 0 and n_g == 0:
        prec = rec = 1.0
    elif n_p == 0:
        prec, rec = 1.0, 0.0
    elif n_g == 0:
        prec, rec = 0.0, 1.0
    else:
        def matched(src, dst):
            d2 = ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
            return (d2.min(1) <= r * r).sum()
        prec = matched(pc, gc) / n_p
        rec = matched(gc, pc) / n_g
    if prec + rec == 0:
        return 0.0
    return 2 * prec * rec / (prec + rec)


def test_f_measure_matches_bruteforce_toolkit_algorithm():
    """Production f_measure == an independent brute-force rendering of
    the toolkit algorithm on random non-trivial blob masks."""
    rng = np.random.default_rng(0)
    h = w = 48
    for trial in range(12):
        yy, xx = np.mgrid[:h, :w]
        def blobs(k):
            m = np.zeros((h, w), bool)
            for _ in range(k):
                cy, cx = rng.integers(5, h - 5), rng.integers(5, w - 5)
                ry, rx = rng.integers(3, 12), rng.integers(3, 12)
                m |= (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
            return m
        pred, gt = blobs(rng.integers(1, 4)), blobs(rng.integers(1, 4))
        if trial == 0:
            pred = np.zeros((h, w), bool)         # empty-pred corner case
        if trial == 1:
            gt = np.zeros((h, w), bool)           # empty-gt corner case
        from rvos_tpu.utils.davis_metrics import f_measure
        got = f_measure(pred, gt)
        want = _bruteforce_f(pred, gt)
        assert abs(got - want) < 1e-12, (trial, got, want)


def test_seg2bmap_hand_values():
    """seg2bmap marks shifted-difference pixels (the row/col OUTSIDE-
    adjacent-above and the band's last row), unlike an erosion boundary."""
    from rvos_tpu.utils.davis_metrics import seg2bmap
    m = np.zeros((8, 8), bool)
    m[3:5, :] = True
    b = seg2bmap(m)
    # row 2 (south-neighbour differs), rows 3?: row 3 interior: e/s/se all
    # True → not boundary except... row 4 (south differs: row5 False)
    assert b[2].all() and b[4].all()
    assert not b[0].any() and not b[6].any()


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
