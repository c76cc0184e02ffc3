"""DAVIS J&F metrics (region similarity + boundary F-measure).

The reference delegates end metrics to the external DAVIS toolkit /
CodaLab servers (``README.md:110``).  For a self-contained framework we
implement the standard definitions (Perazzi et al., CVPR 2016): J =
IoU of the binary masks; F = contour F-measure with a bound-distance
tolerance (0.8 % of the image diagonal), computed via binary contour
extraction + distance-thresholded matching (implemented with cv2
dilation when available, else a numpy fallback).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def jaccard(pred: np.ndarray, gt: np.ndarray) -> float:
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    union = np.count_nonzero(pred | gt)
    if union == 0:
        return 1.0
    return np.count_nonzero(pred & gt) / union


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    """One-pixel-wide boundary of a binary mask."""
    m = mask.astype(np.uint8)
    pad = np.pad(m, 1)
    er = (pad[1:-1, 1:-1] & pad[:-2, 1:-1] & pad[2:, 1:-1]
          & pad[1:-1, :-2] & pad[1:-1, 2:])
    return (m & ~er).astype(np.uint8)


def _dilate(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return mask
    if _HAS_CV2:
        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
        return cv2.dilate(mask, kernel)
    out = mask.copy()
    for _ in range(radius):
        pad = np.pad(out, 1)
        out = (pad[1:-1, 1:-1] | pad[:-2, 1:-1] | pad[2:, 1:-1]
               | pad[1:-1, :-2] | pad[1:-1, 2:])
    return out


def f_measure(pred: np.ndarray, gt: np.ndarray,
              bound_th: float = 0.008) -> float:
    pred_b = _mask_boundary(pred.astype(bool))
    gt_b = _mask_boundary(gt.astype(bool))
    diag = np.sqrt(pred.shape[0] ** 2 + pred.shape[1] ** 2)
    radius = int(np.ceil(bound_th * diag))
    pred_dil = _dilate(pred_b, radius)
    gt_dil = _dilate(gt_b, radius)
    n_pred = pred_b.sum()
    n_gt = gt_b.sum()
    if n_pred == 0 and n_gt == 0:
        return 1.0
    if n_pred == 0 or n_gt == 0:
        return 0.0
    precision = (pred_b & (gt_dil > 0)).sum() / n_pred
    recall = (gt_b & (pred_dil > 0)).sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def evaluate_sequence(pred_masks: Sequence[np.ndarray],
                      gt_masks: Sequence[np.ndarray],
                      object_ids: Sequence[int]) -> Dict[int, Dict[str, float]]:
    """Per-object mean J and F over a sequence (first/last frames
    excluded per DAVIS convention when seq length > 2)."""
    n = len(pred_masks)
    idxs = range(1, n - 1) if n > 2 else range(n)
    out = {}
    for oid in object_ids:
        js, fs = [], []
        for i in idxs:
            p = pred_masks[i] == oid
            g = gt_masks[i] == oid
            js.append(jaccard(p, g))
            fs.append(f_measure(p, g))
        out[oid] = {"J": float(np.mean(js)), "F": float(np.mean(fs))}
    return out


def mean_jf(per_object: Dict[int, Dict[str, float]]) -> Dict[str, float]:
    js = [v["J"] for v in per_object.values()]
    fs = [v["F"] for v in per_object.values()]
    j = float(np.mean(js)) if js else 0.0
    f = float(np.mean(fs)) if fs else 0.0
    return {"J": j, "F": f, "J&F": (j + f) / 2}


def evaluate_dataset_jf(result_root: str, label_root: str,
                        seqs: Sequence[str] | None = None) -> Dict:
    """End-to-end J&F over saved result PNGs vs GT annotations.

    ``result_root/<seq>/<frame>.png`` is compared against
    ``label_root/<seq>/<frame>.png`` for every frame with GT (the
    external DAVIS-toolkit workflow the reference relies on,
    ``README.md:110``, made self-contained).  Per-object scores are
    averaged DAVIS-style: objects pooled across sequences.
    """
    import os

    from PIL import Image

    if seqs is None:
        seqs = sorted(
            s for s in os.listdir(result_root)
            if os.path.isdir(os.path.join(result_root, s)))
    per_seq: Dict[str, Dict[str, float]] = {}
    all_j, all_f = [], []
    for seq in seqs:
        rdir = os.path.join(result_root, seq)
        gdir = os.path.join(label_root, seq)
        if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
            continue
        preds, gts = [], []
        for fname in sorted(os.listdir(rdir)):
            gpath = os.path.join(gdir, fname)
            if not fname.endswith(".png") or not os.path.exists(gpath):
                continue
            preds.append(np.array(Image.open(os.path.join(rdir, fname))))
            gts.append(np.array(Image.open(gpath)))
        if not preds:
            continue
        ids = sorted({int(i) for g in gts for i in np.unique(g)} - {0, 255})
        per_object = evaluate_sequence(preds, gts, ids)
        per_seq[seq] = mean_jf(per_object)
        all_j.extend(v["J"] for v in per_object.values())
        all_f.extend(v["F"] for v in per_object.values())
    j = float(np.mean(all_j)) if all_j else 0.0
    f = float(np.mean(all_f)) if all_f else 0.0
    return {"per_seq": per_seq, "J": j, "F": f, "J&F": (j + f) / 2}
