"""Learnability evidence (VERDICT r3 next #2): overfit one tiny
disk-backed 2-object sequence through the FULL training loop — with
``TRAIN_START_SEQ_TRAINING_STEPS=0`` so the burn-in predicted-prev-mask
branch (reference ``train_manager_mm.py:253-263``) actually executes —
then evaluate random-init vs trained weights on the same sequence with
the streaming RPA evaluator and report DAVIS J&F for both.

Usage:  RVOS_PLATFORM=cpu python workdir/overfit_learn.py \
            [--steps 300] [--backbone mobilenet] [--lr 0.01]

Writes: workdir/overfit/{DAVIS layout, ckpt/, eval_rand/, eval_trained/,
losses.jsonl} and prints a one-line JSON summary.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "overfit")
H = W = 97            # (x-1) % 16 == 0 → eval runs at native resolution
N_FRAMES = 16
SEQ = "ofit"


def build_sequence():
    """DAVIS-2017-layout sequence: static textured background + two
    solid-color squares moving diagonally (trivially color-separable —
    the point is the training LOOP, not the task difficulty)."""
    from PIL import Image

    from rvos_tpu.utils.image import save_mask

    img_dir = os.path.join(ROOT, "JPEGImages", "480p", SEQ)
    lab_dir = os.path.join(ROOT, "Annotations", "480p", SEQ)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    bg = rng.integers(90, 150, (H, W, 3), dtype=np.uint8)   # fixed texture
    for i in range(N_FRAMES):
        img = bg.copy()
        lab = np.zeros((H, W), np.uint8)
        y1, x1 = 8 + 3 * i, 6 + 3 * i          # object 1: red 24x24
        img[y1:y1 + 24, x1:x1 + 24] = (200, 40, 30)
        lab[y1:y1 + 24, x1:x1 + 24] = 1
        y2, x2 = 60 - 2 * i + 2 * i, 64 - 3 * i  # object 2: green 20x20
        y2 = 60
        img[y2:y2 + 20, x2:x2 + 20] = (40, 180, 60)
        lab[y2:y2 + 20, x2:x2 + 20] = 2
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.jpg"),
                                  quality=95)
        save_mask(lab, os.path.join(lab_dir, f"{i:05d}.png"))
    for year in ("2016", "2017"):
        d = os.path.join(ROOT, "ImageSets", year)
        os.makedirs(d, exist_ok=True)
        for split in ("train", "val"):
            with open(os.path.join(d, f"{split}.txt"), "w") as f:
                f.write(f"{SEQ}\n")


def make_cfg(args):
    from rvos_tpu.configs import tiny_test
    return tiny_test(
        EXP_NAME="overfit_r4",
        MODEL_BACKBONE=args.backbone,
        DATA_RANDOMCROP=(65, 65),
        DATA_SHORT_EDGE_LEN=81,                 # 97-px frames: scale .84-1.09
        DATA_CURR_SEQ_LEN=2,
        DATA_MIN_OBJ_PIXEL_NUM=50,
        TRAIN_TOTAL_STEPS=args.steps,
        TRAIN_START_SEQ_TRAINING_STEPS=0,       # burn-in branch from step 1
        TRAIN_HARD_MINING_STEP=max(1, args.steps // 2),
        TRAIN_WARM_UP_STEPS=max(1, args.steps // 10),
        TRAIN_LR=args.lr,
        TEST_MAX_SIZE=None,
        MODEL_MAX_OBJ_NUM=4,
        TEST_BANK_CAPACITY=3,
    )


def evaluate(cfg, model, params, tag):
    from rvos_tpu.data.datasets import DAVISTest
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.utils.davis_metrics import evaluate_dataset_jf

    out = os.path.join(ROOT, f"eval_{tag}")
    os.makedirs(out, exist_ok=True)
    ds = DAVISTest(ROOT, split=["val"], year=2017)
    ev = Evaluator(cfg, model, {"params": params}, out)
    t0 = time.time()
    ev.evaluating(ds, save_root=out)
    jf = evaluate_dataset_jf(out, os.path.join(ROOT, "Annotations", "480p"))
    print(f"[{tag}] J {jf['J']:.4f}  F {jf['F']:.4f}  J&F {jf['J&F']:.4f}"
          f"  ({time.time() - t0:.0f}s)", flush=True)
    return jf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--backbone", type=str, default="mobilenet")
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    if os.environ.get("RVOS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RVOS_PLATFORM"])
    from rvos_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    build_sequence()
    cfg = make_cfg(args)

    from rvos_tpu.data.datasets import DAVISTrain
    from rvos_tpu.data.loader import TrainBatcher
    from rvos_tpu.data.transforms import (balanced_random_crop, random_hflip,
                                          random_scale)
    from rvos_tpu.engine.train import Trainer

    def transform(sample, rng):
        sample = random_scale(sample, cfg.DATA_SHORT_EDGE_LEN,
                              cfg.DATA_MIN_SCALE_FACTOR,
                              cfg.DATA_MAX_SCALE_FACTOR, rng)
        sample = balanced_random_crop(
            sample, cfg.DATA_RANDOMCROP, rng, cfg.DATA_MAX_CROP_STEPS,
            cfg.DATA_MAX_OBJ_NUM, cfg.DATA_MIN_OBJ_PIXEL_NUM)
        return dict(random_hflip(sample, cfg.DATA_RANDOMFLIP, rng))

    ds = DAVISTrain(ROOT, transform=None, image_dtype=np.uint8,
                    repeat_time=64, rand_gap=3,
                    curr_len=cfg.DATA_CURR_SEQ_LEN, seed=11)
    batcher = TrainBatcher(ds, cfg.TRAIN_BATCH_SIZE, transform,
                           num_workers=2)
    trainer = Trainer(cfg, init_spatial=cfg.DATA_RANDOMCROP)

    # random-init baseline J&F first (same process, caches shared)
    rand_params = jax.tree.map(np.asarray, trainer.state.params)
    jf_rand = evaluate(cfg, trainer.model, rand_params, "rand")

    # train: drive train_step directly so per-step losses land in
    # losses.jsonl (Trainer.fit logs at log_every cadence only)
    rng = jax.random.PRNGKey(5)
    losses = []
    log_path = os.path.join(ROOT, "losses.jsonl")
    t0 = time.time()
    with open(log_path, "w") as fh:
        step = 0
        epoch = 0
        while step < args.steps:
            for batch in batcher.epoch(epoch):
                rng, sub = jax.random.split(rng)
                m = trainer.train_step(batch, sub)
                step = int(trainer.state.step)
                rec = {"step": step, "loss": float(m["loss"]),
                       "iou": float(m["iou"])}
                losses.append(rec)
                fh.write(json.dumps(rec) + "\n")
                if step % 10 == 0 or step == 1:
                    dt = (time.time() - t0) / step
                    print(f"step {step}/{args.steps} loss "
                          f"{rec['loss']:.4f} iou {rec['iou']:.3f} "
                          f"({dt:.1f}s/step)", flush=True)
                if step >= args.steps:
                    break
            epoch += 1

    from rvos_tpu.engine.checkpoint import save_checkpoint
    ckpt_dir = os.path.join(ROOT, "ckpt")
    save_checkpoint(ckpt_dir, int(trainer.state.step), trainer.state, 2)

    jf_tr = evaluate(cfg, trainer.model,
                     jax.tree.map(np.asarray, trainer.state.params),
                     "trained")

    first = np.mean([r["loss"] for r in losses[:5]])
    last = np.mean([r["loss"] for r in losses[-5:]])
    print(json.dumps({
        "steps": args.steps, "backbone": args.backbone,
        "loss_first5": round(float(first), 4),
        "loss_last5": round(float(last), 4),
        "iou_last5": round(float(np.mean([r["iou"] for r in losses[-5:]])), 4),
        "jf_random": round(jf_rand["J&F"], 4),
        "jf_trained": round(jf_tr["J&F"], 4),
    }))


if __name__ == "__main__":
    main()
