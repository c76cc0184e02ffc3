"""Training CLI — flag parity with ``tools/train_net_mm.py:14-75``.

Instead of ``mp.spawn`` + NCCL, one process drives a data-parallel
``jax.sharding.Mesh`` over all local TPU devices; ``--gpu_num`` maps to
the mesh's data-axis size for parity.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Train AOC-Net (TPU)")
    p.add_argument("--exp_name", type=str, default="")
    p.add_argument("--config", type=str, default="resnet101_aocnet")
    p.add_argument("--gpu_num", type=int, default=-1,
                   help="data-parallel mesh size (devices)")
    p.add_argument("--batch_size", type=int, default=-1)
    p.add_argument("--pretrained_path", type=str, default="")
    p.add_argument("--datasets", nargs="+", type=str, default=["youtubevos"])
    p.add_argument("--lr", type=float, default=-1.0)
    p.add_argument("--total_step", type=int, default=-1)
    p.add_argument("--start_step", type=int, default=-1)
    p.add_argument("--float16", action="store_true")
    p.add_argument("--global_atrous_rate", type=int, default=1)
    p.add_argument("--global_chunks", type=int, default=20,
                   help="accepted for reference-CLI parity only; a no-op "
                        "here — matching tiles in-kernel (Pallas), so "
                        "host-level chunking never runs")
    p.add_argument("--davis_root", type=str, default="")
    p.add_argument("--ytb_root", type=str, default="")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic smoke dataset")
    return p


def apply_args(cfg, args):
    if args.exp_name:
        cfg = cfg.replace(EXP_NAME=args.exp_name)
    if args.gpu_num > 0:
        cfg = cfg.replace(TRAIN_GPUS=args.gpu_num, MESH_DATA_AXIS=args.gpu_num)
    if args.batch_size > 0:
        cfg = cfg.replace(TRAIN_BATCH_SIZE=args.batch_size)
    if args.pretrained_path:
        cfg = cfg.replace(PRETRAIN_MODEL=args.pretrained_path, PRETRAIN=True)
    if args.lr > 0:
        cfg = cfg.replace(TRAIN_LR=args.lr)
    if args.total_step > 0:
        cfg = cfg.replace(
            TRAIN_TOTAL_STEPS=args.total_step,
            TRAIN_START_SEQ_TRAINING_STEPS=args.total_step // 2,
            TRAIN_HARD_MINING_STEP=args.total_step // 2)
    if args.start_step > 0:
        cfg = cfg.replace(TRAIN_START_STEP=args.start_step)
    cfg = cfg.replace(
        MATCHING_DTYPE="bfloat16" if args.float16 else "float32",
        TRAIN_GLOBAL_ATROUS_RATE=args.global_atrous_rate,
        TRAIN_GLOBAL_CHUNKS=args.global_chunks,
        DATASETS=tuple(args.datasets),
    )
    if args.davis_root:
        cfg = cfg.replace(DIR_DAVIS=args.davis_root)
    if args.ytb_root:
        cfg = cfg.replace(DIR_YTB=args.ytb_root)
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)

    import os

    import jax

    # RVOS_PLATFORM=cpu forces the backend BEFORE init — the hosted TPU
    # plugin ignores the standard JAX_PLATFORMS env var (CLAUDE.md)
    if os.environ.get("RVOS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RVOS_PLATFORM"])

    # RVOS_MULTIHOST=1: join the multi-process runtime (one process per
    # host; the reference's mp.spawn + TCP rendezvous analogue,
    # tools/train_net_mm.py:72) — must precede any backend use
    from ..parallel.distributed import maybe_initialize
    maybe_initialize()

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ..configs import get_config
    from ..data.datasets import DAVISTrain, SyntheticTrain, YTBVOSTrain
    from ..data.loader import TrainBatcher
    from ..data.transforms import (balanced_random_crop, normalize,
                                   random_hflip, random_scale)
    from ..engine.train import Trainer
    import numpy as np

    cfg = apply_args(get_config(args.config), args)

    # (sample, rng) signature: TrainBatcher applies the transform on the
    # prefetch worker threads with a per-item Generator seeded by
    # (seed, epoch, index) — thread-safe AND schedule-independent
    def transform(sample, rng):
        if args.synthetic:
            # synthetic samples are float; normalize on host (legacy)
            out = dict(sample)
            out["ref_img"] = normalize(sample["ref_img"])
            out["prev_img"] = normalize(sample["prev_img"])
            out["curr_img"] = [normalize(x) for x in sample["curr_img"]]
            return out
        # real datasets decode uint8 and stay uint8 through the whole
        # host aug chain (u8 cv2 resizes ~6x faster, 4x smaller
        # collate/H2D); the train step normalizes in-graph
        sample = random_scale(sample, cfg.DATA_SHORT_EDGE_LEN,
                              cfg.DATA_MIN_SCALE_FACTOR,
                              cfg.DATA_MAX_SCALE_FACTOR, rng)
        sample = balanced_random_crop(
            sample, cfg.DATA_RANDOMCROP, rng, cfg.DATA_MAX_CROP_STEPS,
            cfg.DATA_MAX_OBJ_NUM, cfg.DATA_MIN_OBJ_PIXEL_NUM)
        return dict(random_hflip(sample, cfg.DATA_RANDOMFLIP, rng))

    datasets = []
    if args.synthetic:
        datasets.append(SyntheticTrain(size=cfg.DATA_RANDOMCROP,
                                       curr_len=cfg.DATA_CURR_SEQ_LEN))
    else:
        for name in cfg.DATASETS:
            if name == "davis2017":
                datasets.append(DAVISTrain(
                    cfg.DIR_DAVIS, transform=None,
                    image_dtype=np.uint8,
                    full_resolution=cfg.TRAIN_DATASET_FULL_RESOLUTION,
                    repeat_time=cfg.DATA_DAVIS_REPEAT,
                    rand_gap=cfg.DATA_RANDOM_GAP_DAVIS,
                    curr_len=cfg.DATA_CURR_SEQ_LEN,
                    rand_reverse=cfg.DATA_RANDOM_REVERSE_SEQ))
            elif name == "youtubevos":
                datasets.append(YTBVOSTrain(
                    cfg.DIR_YTB, transform=None,
                    image_dtype=np.uint8,
                    rand_gap=cfg.DATA_RANDOM_GAP_YTB,
                    curr_len=cfg.DATA_CURR_SEQ_LEN,
                    rand_reverse=cfg.DATA_RANDOM_REVERSE_SEQ))
            else:
                raise ValueError(f"unknown dataset {name}")

    class Concat:
        def __init__(self, parts):
            self.parts = parts
            self.lens = [len(p) for p in parts]

        def __len__(self):
            return sum(self.lens)

        def __getitem__(self, i):
            for p, n in zip(self.parts, self.lens):
                if i < n:
                    return p[i]
                i -= n
            raise IndexError

    dataset = Concat(datasets)
    batcher = TrainBatcher(dataset, cfg.TRAIN_BATCH_SIZE, transform,
                           num_workers=cfg.DATA_WORKERS,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())

    trainer = Trainer(cfg)
    dirs = cfg.result_dirs()
    trainer.fit(batcher, log_every=cfg.TRAIN_LOG_STEP,
                save_every=cfg.TRAIN_SAVE_STEP, ckpt_dir=dirs["ckpt"])


if __name__ == "__main__":
    main()
