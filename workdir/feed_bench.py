"""Train-feed throughput: can the host pipeline keep the 0.57 s/step
device train step fed?  (VERDICT r2 weak #7 / next #6.)

Fabricates a DAVIS-layout dataset of 480p JPEG sequences on disk, then
times TrainBatcher end-to-end — JPEG decode, RandomScale,
BalancedRandomCrop(465²), flip, normalize, collate — at several worker
counts.  A batch-8 step needs 8 samples / 0.57 s ≈ 14 samples/s.

Usage: python workdir/feed_bench.py [n_workers ...]
"""

import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rvos_tpu.data.datasets import DAVISTrain                      # noqa: E402
from rvos_tpu.data.loader import TrainBatcher                      # noqa: E402
from rvos_tpu.data.transforms import (balanced_random_crop,        # noqa: E402
                                      normalize, random_hflip, random_scale)
from rvos_tpu.utils.image import save_mask                         # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "feed_data")
H, W = 480, 854
N_SEQS, N_FRAMES = 4, 24


def make_dataset():
    res = "480p"
    rng = np.random.default_rng(0)
    for s in range(N_SEQS):
        seq = f"seq{s}"
        img_dir = os.path.join(ROOT, "JPEGImages", res, seq)
        lab_dir = os.path.join(ROOT, "Annotations", res, seq)
        if os.path.exists(os.path.join(img_dir, f"{N_FRAMES - 1:05d}.jpg")):
            continue
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        lab = np.zeros((H, W), np.uint8)
        lab[100:300, 100:400] = 1
        lab[320:460, 200:600] = 2
        for i in range(N_FRAMES):
            Image.fromarray(np.roll(base, 5 * i, axis=1)).save(
                os.path.join(img_dir, f"{i:05d}.jpg"), quality=90)
            save_mask(np.roll(lab, 5 * i, axis=1),
                      os.path.join(lab_dir, f"{i:05d}.png"))
    sets_dir = os.path.join(ROOT, "ImageSets", "2017")
    os.makedirs(sets_dir, exist_ok=True)
    with open(os.path.join(sets_dir, "train.txt"), "w") as f:
        f.write("\n".join(f"seq{s}" for s in range(N_SEQS)) + "\n")


def transform(sample, rng):
    """Production u8 pipeline (cli/train.py): aug in uint8, in-graph
    normalize — no host normalize pass."""
    sample = random_scale(sample, 480, 1.0, 1.3, rng)
    sample = balanced_random_crop(sample, (465, 465), rng, 5, 5, 100)
    return dict(random_hflip(sample, 0.5, rng))


def transform_f32(sample, rng):
    """Legacy f32 pipeline (host normalize) for comparison."""
    sample = random_scale(sample, 480, 1.0, 1.3, rng)
    sample = balanced_random_crop(sample, (465, 465), rng, 5, 5, 100)
    sample = random_hflip(sample, 0.5, rng)
    out = dict(sample)
    out["ref_img"] = normalize(sample["ref_img"])
    out["prev_img"] = normalize(sample["prev_img"])
    out["curr_img"] = [normalize(x) for x in sample["curr_img"]]
    return out


def main():
    make_dataset()
    workers = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    ds = DAVISTrain(ROOT, repeat_time=8, curr_len=5, seed=0,
                    image_dtype=np.uint8)
    for nw in workers:
        batcher = TrainBatcher(ds, batch_size=8, transform=transform,
                               num_workers=nw)
        n_batches, n_samples = 0, 0
        t0 = time.perf_counter()
        for batch in batcher.epoch(0):
            n_batches += 1
            n_samples += batch["ref_img"].shape[0]
            if n_batches >= 3:
                break
        dt = time.perf_counter() - t0
        sps = n_samples / dt
        print(f"workers={nw}: {sps:.1f} samples/s "
              f"({sps / 8:.2f} steps/s vs device 1/0.57={1 / 0.57:.2f}) "
              f"[{n_samples} samples in {dt:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
