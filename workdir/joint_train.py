"""Joint feed+device sustained training window (VERDICT r3 next #5).

Runs 50+ consecutive FULL-SCALE train steps on the real chip — 465²
crop, T=5 rollout, ResNet-101, bf16 — fed by the production threaded
uint8 host pipeline from a disk-backed 480p DAVIS layout (JPEG decode +
RandomScale + BalancedRandomCrop + flip on prefetch worker threads,
in-graph normalize).  Reports wall steps/s vs the 0.57 s/step
device-only number, plus the feed-stall fraction: the wall time the
main loop spent BLOCKED waiting for the next batch.

The loop never syncs mid-window (metrics futures are kept, one
``np.asarray`` at the end), so host feed and device compute overlap
exactly as in production ``Trainer.fit``.

Usage: python workdir/joint_train.py [n_steps] [batch_size] [workers]
Reference cadence being matched: train_manager_mm.py:285-296.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RVOS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RVOS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from feed_bench import ROOT, make_dataset
from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.datasets import DAVISTrain
from rvos_tpu.data.loader import TrainBatcher
from rvos_tpu.data.transforms import (balanced_random_crop, random_hflip,
                                      random_scale)
from rvos_tpu.engine.train import Trainer

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 55
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
WORKERS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
WARMUP = 3

make_dataset()
cfg = resnet101_aocnet().replace(
    TRAIN_BATCH_SIZE=BS,
    TRAIN_COMPUTE_DTYPE="bfloat16",
    TRAIN_AUTO_RESUME=False,
    PRETRAIN=False,
)


def transform(sample, rng):
    # the production uint8 chain from cli/train.py
    sample = random_scale(sample, cfg.DATA_SHORT_EDGE_LEN,
                          cfg.DATA_MIN_SCALE_FACTOR,
                          cfg.DATA_MAX_SCALE_FACTOR, rng)
    sample = balanced_random_crop(
        sample, cfg.DATA_RANDOMCROP, rng, cfg.DATA_MAX_CROP_STEPS,
        cfg.DATA_MAX_OBJ_NUM, cfg.DATA_MIN_OBJ_PIXEL_NUM)
    return dict(random_hflip(sample, cfg.DATA_RANDOMFLIP, rng))


ds = DAVISTrain(ROOT, transform=None, image_dtype=np.uint8,
                repeat_time=30, rand_gap=3,
                curr_len=cfg.DATA_CURR_SEQ_LEN, seed=7)
batcher = TrainBatcher(ds, BS, transform, num_workers=WORKERS)

t0 = time.perf_counter()
trainer = Trainer(cfg)
print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

rng = jax.random.PRNGKey(3)


def batches():
    epoch = 0
    while True:
        for b in batcher.epoch(epoch):
            yield b
        epoch += 1


it = batches()

# warmup: compile + layout respecialization (2 retraces on this stack)
for i in range(WARMUP):
    t0 = time.perf_counter()
    m = trainer.train_step(next(it), jax.random.fold_in(rng, i))
    loss = float(np.asarray(m["loss"]))
    print(f"warmup {i}: {time.perf_counter() - t0:.1f}s loss={loss:.3f}",
          flush=True)

# measured window: no mid-window syncs; batch-wait timed per step
metrics = []
waits = []
t_start = time.perf_counter()
for i in range(N_STEPS):
    tw = time.perf_counter()
    batch = next(it)
    waits.append(time.perf_counter() - tw)
    metrics.append(trainer.train_step(
        batch, jax.random.fold_in(rng, WARMUP + i)))
last_loss = float(np.asarray(metrics[-1]["loss"]))  # drain the chain
wall = time.perf_counter() - t_start

stall = float(np.sum(waits))
print(json.dumps({
    "n_steps": N_STEPS, "batch_size": BS, "workers": WORKERS,
    "wall_s": round(wall, 2),
    "steps_per_s": round(N_STEPS / wall, 4),
    "s_per_step": round(wall / N_STEPS, 4),
    "feed_stall_s": round(stall, 2),
    "feed_stall_frac": round(stall / wall, 4),
    "max_wait_s": round(float(np.max(waits)), 3),
    "last_loss": round(last_loss, 4),
}), flush=True)
