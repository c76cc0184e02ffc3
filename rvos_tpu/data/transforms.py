"""Host-side data transforms (pure numpy/cv2 functions on uint8/float32
frames) — the reference's ``dataloaders/custom_transforms.py`` rebuilt
as composable functions instead of torchvision-style classes.

Train pipeline (ref :170-385): RandomScale (short-edge align ×[1,1.3])
→ BalancedRandomCrop (465², keeps ≥100-px objects, ≤5 objects, relabels
to contiguous ids) → RandomHorizontalFlip → normalize.

Eval pipeline (ref :387-463): ``restrict_size`` caps the long edge
(800·1.3 default), applies the multi-scale factor, and snaps H, W to
the (x−1)%16==0 grid AOCNet's stride tower expects; ``normalize``
applies the ImageNet mean/std.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)   # ref custom_transforms.py:7
    _HAS_CV2 = True
except Exception:          # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize_img(img: np.ndarray, hw: Tuple[int, int], cubic=True) -> np.ndarray:
    if img.shape[:2] == tuple(hw):
        return img
    if _HAS_CV2:
        interp = cv2.INTER_CUBIC if cubic else cv2.INTER_NEAREST
        return cv2.resize(img, dsize=(hw[1], hw[0]), interpolation=interp)
    from PIL import Image
    mode = Image.BICUBIC if cubic else Image.NEAREST
    return np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (hw[1], hw[0]), mode)).astype(img.dtype)


def _resize_label(lab: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    if lab.shape[:2] == tuple(hw):
        return lab
    if _HAS_CV2:
        return cv2.resize(lab, dsize=(hw[1], hw[0]),
                          interpolation=cv2.INTER_NEAREST)
    from PIL import Image
    return np.asarray(Image.fromarray(lab).resize((hw[1], hw[0]),
                                                  Image.NEAREST))


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8/float [H,W,3] RGB → float32 normalized (ref :352-385)."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def snap_16(x: int) -> int:
    """(x-1) % 16 == 0 snap (ref MultiRestrictSize :427-430)."""
    if (x - 1) % 16 != 0:
        x = int(np.around((x - 1) / 16.0) * 16 + 1)
    return x


def restrict_size(h: int, w: int, max_size: Optional[float] = 800 * 1.3,
                  min_size: Optional[int] = None,
                  scale: float = 1.0) -> Tuple[int, int]:
    """Eval resize policy (ref MultiRestrictSize :395-430)."""
    sc = None
    if min_size is not None:
        short = min(h, w)
        if short > min_size:
            sc = float(min_size) / short
    else:
        long = max(h, w)
        if max_size is not None and long > max_size:
            sc = float(max_size) / long
    nh, nw = (h, w) if sc is None else (sc * h, sc * w)
    nh = int(nh * scale)
    nw = int(nw * scale)
    return snap_16(nh), snap_16(nw)


def random_scale(sample: Dict, short_edge: int, min_f: float, max_f: float,
                 rng: np.random.Generator) -> Dict:
    """Short-edge align then random scale ×[min_f, max_f] (ref :170-215)."""
    img = sample["ref_img"]
    h, w = img.shape[:2]
    sc = short_edge / min(h, w)
    sc *= rng.uniform(min_f, max_f)
    hw = (int(round(h * sc)), int(round(w * sc)))
    out = {}
    for k, v in sample.items():
        if k == "meta":
            out[k] = v
        elif "label" in k:
            out[k] = ([_resize_label(x, hw) for x in v] if isinstance(v, list)
                      else _resize_label(v, hw))
        else:
            out[k] = ([_resize_img(x, hw) for x in v] if isinstance(v, list)
                      else _resize_img(v, hw))
    return out


def balanced_random_crop(sample: Dict, size: Tuple[int, int],
                         rng: np.random.Generator, max_step: int = 5,
                         max_obj_num: int = 5,
                         min_obj_pixel_num: int = 100) -> Dict:
    """Object-preserving random crop with contiguous relabeling
    (ref ``BalancedRandomCrop``, ``custom_transforms.py:59-167``).

    The crop is retried until the *reference*-frame crop keeps at least
    one object with > ``min_obj_pixel_num`` pixels; every frame is then
    relabeled to the surviving object set with contiguous ids (objects
    outside it become background).  This matches the reference exactly:
    its object-selection loop computes ``contains`` for prev/curr crops
    too but only ever reads ``contains[0]`` — the ref frame
    (``custom_transforms.py:97-116``) — and the relabel pass applies the
    ref-selected set to every frame (``:130-147``), so objects visible
    only in prev/curr become background there as well.  Prev/curr-frame
    object *availability* is enforced one level up, by the dataset's
    resample-retry loop (every prev/curr object must exist in the ref
    label, ``datasets_m.py:152-182`` / ``VOSTrain.__getitem__``).  When
    more than ``max_obj_num`` objects survive, a random subset is kept
    (ref :122-124 shuffles before truncating).
    """
    ref_label = sample["ref_label"]
    h, w = ref_label.shape[:2]
    nh, nw = min(size[0], h), min(size[1], w)

    top, left, objs = 0, 0, []
    for _ in range(max_step):
        top = int(rng.integers(0, h - nh + 1))
        left = int(rng.integers(0, w - nw + 1))
        ref_crop = ref_label[top:top + nh, left:left + nw]
        objs = np.unique(ref_crop)
        objs = objs[objs != 0]
        objs = [o for o in objs
                if (ref_crop == o).sum() > min_obj_pixel_num]
        if objs:
            if len(objs) > max_obj_num:
                objs = list(rng.permutation(np.asarray(objs))[:max_obj_num])
            break

    remap = np.zeros(256, np.uint8)
    for new_id, old_id in enumerate(objs, start=1):
        remap[old_id] = new_id

    out = {"meta": dict(sample.get("meta", {}))}
    out["meta"]["obj_num"] = len(objs)
    for k, v in sample.items():
        if k == "meta":
            continue

        def crop_one(x, is_label):
            x = x[top:top + nh, left:left + nw]
            if is_label:
                x = remap[x]
            return x

        is_label = "label" in k
        out[k] = ([crop_one(x, is_label) for x in v] if isinstance(v, list)
                  else crop_one(v, is_label))
    return out


def random_hflip(sample: Dict, p: float, rng: np.random.Generator) -> Dict:
    if rng.uniform() >= p:
        return sample
    out = {}
    for k, v in sample.items():
        if k == "meta":
            out[k] = v
        else:
            out[k] = ([np.ascontiguousarray(x[:, ::-1]) for x in v]
                      if isinstance(v, list)
                      else np.ascontiguousarray(v[:, ::-1]))
    return out


def eval_variants(img: np.ndarray, max_size: Optional[float],
                  min_size: Optional[int], flip: bool,
                  multi_scale: Sequence[float]) -> List[Dict]:
    """MultiRestrictSize: one resized variant per scale (+ a flip twin
    per scale when ``flip``), ref :387-463.  Labels are deliberately
    NOT resized — the evaluator keeps them at original resolution like
    the reference.

    Flip twins carry the UNFLIPPED pixels in ``img`` (plus
    ``flip=True``): the evaluator materializes the horizontal flip on
    device (`_var_dev`, bit-exact and free), so a host
    ``ascontiguousarray`` copy per flip variant per frame would be pure
    waste on the CPU-bound eval host."""
    h, w = img.shape[:2]
    variants = []
    for scale in multi_scale:
        nh, nw = restrict_size(h, w, max_size, min_size, scale)
        im = _resize_img(img, (nh, nw)) if (nh, nw) != (h, w) else img
        variants.append({"img": im, "flip": False, "scale": scale})
        if flip:
            variants.append({"img": im, "flip": True, "scale": scale})
    return variants
