"""Generalization + eval-knob A/B at the J&F level (VERDICT r4 next #1).

Two questions the framework previously took on faith:

1. **Generalization** — train on N synthetic sequences, evaluate J&F on
   HELD-OUT sequences (unseen textures, object colors, trajectories).
   The r4 overfit harness proved the loop learns; this proves the
   learned matching transfers (held-out J&F >> random-init J&F).

2. **Eval-knob J&F deltas** — the production eval defaults
   (`MATCHING_DTYPE="mixed"`, `EVAL_COMPUTE_DTYPE="bfloat16"`,
   `MATCHING_MAX_REF_PIXELS=16384`, occupancy-segmented bank) were only
   ever validated at kernel rel-err level.  Here each knob is A/B'd at
   the J&F level on long (48-frame) held-out sequences with 5 objects
   at 385x385, where the 8-slot bank holds ~75k rows and the compaction
   cap actually binds (16384 keeps ~22% of rows).

Usage:
  python workdir/gen_ab.py build               # write the dataset
  python workdir/gen_ab.py train [--steps 600] # train + save ckpt
  python workdir/gen_ab.py eval_ab [--configs default,cap4096,...]
  python workdir/gen_ab.py all

Writes workdir/genab/{DAVIS layout, ckpt/, eval_*/ trees, ab.jsonl}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "genab")

TRAIN_SEQS = 10
VAL_SEQS = 3
TRAIN_FRAMES = 16
VAL_FRAMES = 48
TRAIN_HW = 241          # train images (crops taken from these)
VAL_HW = 385            # (385-1)%16==0 -> eval runs at native resolution
N_OBJ = 5               # per sequence; MODEL_MAX_OBJ_NUM=6 (bg + 5)


def _texture(rng, hw, scale=8):
    """Smooth random background texture: low-res noise, bicubic up."""
    import cv2
    small = rng.integers(60, 200, (hw // scale, hw // scale, 3),
                         dtype=np.uint8)
    return cv2.resize(small, (hw, hw), interpolation=cv2.INTER_CUBIC)


def _draw_obj(img, lab, oid, shape, color, cy, cx, sy, sx):
    h, w = lab.shape
    y0, y1 = int(max(0, cy - sy)), int(min(h, cy + sy))
    x0, x1 = int(max(0, cx - sx)), int(min(w, cx + sx))
    if y1 <= y0 or x1 <= x0:
        return
    if shape == 0:                                   # rectangle
        img[y0:y1, x0:x1] = color
        lab[y0:y1, x0:x1] = oid
    else:                                            # ellipse
        yy, xx = np.mgrid[y0:y1, x0:x1]
        m = (((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2) <= 1.0
        img[y0:y1, x0:x1][m] = color
        lab[y0:y1, x0:x1][m] = oid


def build_sequence(seq_dir, lab_dir, seed, hw, n_frames):
    """One DAVIS-layout sequence: textured background + N_OBJ moving
    colored shapes (random color/size/velocity/shape per object, linear
    motion with edge bounce).  Different seeds give disjoint appearance
    -> held-out sequences are genuinely unseen."""
    from PIL import Image

    from rvos_tpu.utils.image import save_mask

    os.makedirs(seq_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    bg = _texture(rng, hw)
    # well-separated random colors (distinct hues, full saturation)
    import colorsys
    hues = (rng.uniform(0, 1) + np.arange(N_OBJ) / N_OBJ) % 1.0
    colors = [tuple(int(255 * c) for c in colorsys.hsv_to_rgb(
        h, rng.uniform(0.7, 1.0), rng.uniform(0.7, 1.0))) for h in hues]
    shapes = rng.integers(0, 2, N_OBJ)
    # >= ~8 embedding-stride pixels even after crop/downscale: a VALID
    # object with zero pixels at the matching resolution is the
    # eps-normalization grad hazard (genab_train.log step-158 NaN)
    size = rng.uniform(0.08, 0.14, (N_OBJ, 2)) * hw   # half-extents
    pos = rng.uniform(0.2, 0.8, (N_OBJ, 2)) * hw
    vel = rng.uniform(-0.012, 0.012, (N_OBJ, 2)) * hw
    for i in range(n_frames):
        img = bg.copy()
        lab = np.zeros((hw, hw), np.uint8)
        for o in range(N_OBJ):
            _draw_obj(img, lab, o + 1, shapes[o], colors[o],
                      pos[o, 0], pos[o, 1], size[o, 0], size[o, 1])
        Image.fromarray(img).save(os.path.join(seq_dir, f"{i:05d}.jpg"),
                                  quality=95)
        save_mask(lab, os.path.join(lab_dir, f"{i:05d}.png"))
        pos += vel
        for o in range(N_OBJ):                        # bounce
            for d in range(2):
                if pos[o, d] < size[o, d] or pos[o, d] > hw - size[o, d]:
                    vel[o, d] = -vel[o, d]
                    pos[o, d] += 2 * vel[o, d]


def build():
    img_root = os.path.join(ROOT, "JPEGImages", "480p")
    lab_root = os.path.join(ROOT, "Annotations", "480p")
    train_names, val_names = [], []
    for s in range(TRAIN_SEQS):
        nm = f"tr{s:02d}"
        build_sequence(os.path.join(img_root, nm),
                       os.path.join(lab_root, nm),
                       seed=100 + s, hw=TRAIN_HW, n_frames=TRAIN_FRAMES)
        train_names.append(nm)
    for s in range(VAL_SEQS):
        nm = f"val{s:02d}"
        build_sequence(os.path.join(img_root, nm),
                       os.path.join(lab_root, nm),
                       seed=900 + s, hw=VAL_HW, n_frames=VAL_FRAMES)
        val_names.append(nm)
    for year in ("2016", "2017"):
        d = os.path.join(ROOT, "ImageSets", year)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "train.txt"), "w") as f:
            f.write("\n".join(train_names) + "\n")
        with open(os.path.join(d, "val.txt"), "w") as f:
            f.write("\n".join(val_names) + "\n")
    print(f"built {TRAIN_SEQS} train + {VAL_SEQS} val sequences under "
          f"{ROOT}", flush=True)


def make_cfg(steps=600, lr=0.01):
    from rvos_tpu.configs import tiny_test
    import jax
    on_tpu = jax.default_backend() == "tpu"
    return tiny_test(
        EXP_NAME="genab",
        MODEL_BACKBONE="mobilenet",
        DATA_RANDOMCROP=(97, 97),
        DATA_SHORT_EDGE_LEN=161,               # 241 source: scale .67-.87
        DATA_CURR_SEQ_LEN=2,
        DATA_MIN_OBJ_PIXEL_NUM=50,
        DATA_MAX_OBJ_NUM=N_OBJ,
        MODEL_MAX_OBJ_NUM=N_OBJ + 1,
        TRAIN_TOTAL_STEPS=steps,
        TRAIN_START_SEQ_TRAINING_STEPS=steps // 3,
        TRAIN_HARD_MINING_STEP=steps // 2,
        TRAIN_WARM_UP_STEPS=max(1, steps // 10),
        TRAIN_LR=lr,
        TEST_MAX_SIZE=None,
        TEST_BANK_CAPACITY=8,
        USE_PALLAS=on_tpu,
        # production eval defaults (the A/B base)
        MATCHING_DTYPE="mixed",
        EVAL_COMPUTE_DTYPE="bfloat16",
        MATCHING_MAX_REF_PIXELS=16384,
    )


def train(args):
    import jax

    from rvos_tpu.data.datasets import DAVISTrain
    from rvos_tpu.data.loader import TrainBatcher
    from rvos_tpu.data.transforms import (balanced_random_crop, random_hflip,
                                          random_scale)
    from rvos_tpu.engine.checkpoint import save_checkpoint
    from rvos_tpu.engine.train import Trainer

    cfg = make_cfg(args.steps, args.lr)

    def transform(sample, rng):
        sample = random_scale(sample, cfg.DATA_SHORT_EDGE_LEN,
                              cfg.DATA_MIN_SCALE_FACTOR,
                              cfg.DATA_MAX_SCALE_FACTOR, rng)
        sample = balanced_random_crop(
            sample, cfg.DATA_RANDOMCROP, rng, cfg.DATA_MAX_CROP_STEPS,
            cfg.DATA_MAX_OBJ_NUM, cfg.DATA_MIN_OBJ_PIXEL_NUM)
        return dict(random_hflip(sample, cfg.DATA_RANDOMFLIP, rng))

    ds = DAVISTrain(ROOT, split=("train",), transform=None,
                    image_dtype=np.uint8, repeat_time=8, rand_gap=3,
                    curr_len=cfg.DATA_CURR_SEQ_LEN, seed=11)
    batcher = TrainBatcher(ds, cfg.TRAIN_BATCH_SIZE, transform,
                           num_workers=2)
    trainer = Trainer(cfg, init_spatial=cfg.DATA_RANDOMCROP)

    rng = jax.random.PRNGKey(5)
    losses = []
    t0 = time.time()
    log_path = os.path.join(ROOT, "losses.jsonl")
    with open(log_path, "w") as fh:
        step, epoch = 0, 0
        while step < args.steps:
            for batch in batcher.epoch(epoch):
                rng, sub = jax.random.split(rng)
                m = trainer.train_step(batch, sub)
                step = int(trainer.state.step)
                rec = {"step": step, "loss": float(m["loss"]),
                       "iou": float(m["iou"])}
                losses.append(rec)
                fh.write(json.dumps(rec) + "\n")
                if step % 20 == 0 or step == 1:
                    dt = (time.time() - t0) / step
                    print(f"step {step}/{args.steps} loss "
                          f"{rec['loss']:.4f} iou {rec['iou']:.3f} "
                          f"({dt:.1f}s/step)", flush=True)
                if step >= args.steps:
                    break
            epoch += 1
    save_checkpoint(os.path.join(ROOT, "ckpt"), int(trainer.state.step),
                    trainer.state, 2)
    print(json.dumps({
        "steps": args.steps,
        "loss_first5": round(float(np.mean([r["loss"]
                                            for r in losses[:5]])), 4),
        "loss_last5": round(float(np.mean([r["loss"]
                                           for r in losses[-5:]])), 4),
        "iou_last5": round(float(np.mean([r["iou"]
                                          for r in losses[-5:]])), 4),
    }), flush=True)


# knob -> config overrides (base = make_cfg defaults, the production
# eval policy).  Every entry answers one "taken on faith" question.
AB_MATRIX = {
    "default": {},
    "random_init": {},                        # control: untrained params
    "parity_f32_nocap": {"MATCHING_DTYPE": "float32",
                         "EVAL_COMPUTE_DTYPE": "float32",
                         "MATCHING_MAX_REF_PIXELS": 0},
    "match_f32": {"MATCHING_DTYPE": "float32"},
    "eval_f32": {"EVAL_COMPUTE_DTYPE": "float32"},
    "cap4096": {"MATCHING_MAX_REF_PIXELS": 4096},
    "cap65536": {"MATCHING_MAX_REF_PIXELS": 65536},
    "cap_off": {"MATCHING_MAX_REF_PIXELS": 0},
    "uniform_bank": {"MATCHING_OCCUPANCY_BANK": False},
    "unsegmented": {"MATCHING_SEGMENTED_BANK": False},
    "atrous2": {"TEST_GLOBAL_ATROUS_RATE": 2},
}


def eval_ab(args):
    import jax

    from rvos_tpu.data.datasets import DAVISTest
    from rvos_tpu.engine.checkpoint import restore_checkpoint
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model
    from rvos_tpu.utils.davis_metrics import evaluate_dataset_jf

    cfg = make_cfg(args.steps, args.lr)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (97, 97))
    rand_params = jax.tree.map(np.asarray, variables["params"])

    from rvos_tpu.engine.train import Trainer
    trainer = Trainer(cfg, init_spatial=(97, 97))
    state, step = restore_checkpoint(os.path.join(ROOT, "ckpt"), None,
                                     trainer.state)
    params = jax.tree.map(np.asarray, state.params)
    print(f"restored ckpt step {step}", flush=True)

    names = (args.configs.split(",") if args.configs
             else list(AB_MATRIX.keys()))
    ds = DAVISTest(ROOT, split=["val"], year=2017)
    lab_root = os.path.join(ROOT, "Annotations", "480p")
    ab_path = os.path.join(ROOT, "ab.jsonl")
    rows = []
    from rvos_tpu.models import AOCNet
    for name in names:
        ov = AB_MATRIX[name]
        ecfg = cfg.replace(**ov)
        p = rand_params if name == "random_init" else params
        out = os.path.join(ROOT, f"eval_{name}")
        os.makedirs(out, exist_ok=True)
        # segment_frame reads the MODEL's config — rebuild per knob set
        # (params are layout-compatible across eval knobs)
        ev = Evaluator(ecfg, AOCNet(ecfg), {"params": p}, out)
        t0 = time.time()
        ev.evaluating(ds, save_root=out, verbose=False)
        dt = time.time() - t0
        jf = evaluate_dataset_jf(out, lab_root)
        rec = {"config": name, "overrides": ov,
               "J": round(jf["J"], 4), "F": round(jf["F"], 4),
               "J&F": round(jf["J&F"], 4), "eval_s": round(dt, 1)}
        rows.append(rec)
        with open(ab_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"[{name:18s}] J {jf['J']:.4f}  F {jf['F']:.4f}  "
              f"J&F {jf['J&F']:.4f}  ({dt:.0f}s)", flush=True)

    base = next((r for r in rows if r["config"] == "default"), None)
    if base:
        print("\nconfig              J&F     delta vs default")
        for r in rows:
            print(f"{r['config']:18s} {r['J&F']:.4f}  "
                  f"{r['J&F'] - base['J&F']:+.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "train", "eval_ab", "all"])
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--configs", type=str, default="")
    args = ap.parse_args()

    import jax
    if os.environ.get("RVOS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RVOS_PLATFORM"])
    from rvos_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.cmd in ("build", "all"):
        build()
    if args.cmd in ("train", "all"):
        train(args)
    if args.cmd in ("eval_ab", "all"):
        eval_ab(args)


if __name__ == "__main__":
    main()
