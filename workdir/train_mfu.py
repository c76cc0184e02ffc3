"""Train-step MFU + batch-size scaling on the real chip (VERDICT r4
next #7).

Anchors the measured step time: XLA's own cost analysis gives the
compiled step's FLOPs; MFU = FLOPs / (step_time * peak).  v5e peak:
197 TFLOP/s bf16, 98.5 TFLOP/s f32 (the train recipe keeps f32
params/matching per the precision policy; TRAIN_COMPUTE_DTYPE=bfloat16
runs the towers bf16).

Usage: python workdir/train_mfu.py [--bs 1,2,4] [--crop 465] [--seq 5]
       [--dtype f32|bf16]
Prints one JSON line per batch size + a recommendation.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.engine.train import Trainer

PEAK = {"bf16": 197e12, "f32": 98.5e12}     # v5e per-chip peak FLOP/s


def make_batch(b, hw, seqlen, rng):
    H = W = hw
    return {
        "ref_img": jnp.asarray(rng.standard_normal((b, H, W, 3), np.float32)),
        "prev_img": jnp.asarray(
            rng.standard_normal((b, H, W, 3), np.float32)),
        "curr_img": jnp.asarray(
            rng.standard_normal((seqlen, b, H, W, 3), np.float32)),
        "ref_label": jnp.asarray(
            rng.integers(0, 3, (b, H, W)).astype(np.int32)),
        "prev_label": jnp.asarray(
            rng.integers(0, 3, (b, H, W)).astype(np.int32)),
        "curr_label": jnp.asarray(
            rng.integers(0, 3, (seqlen, b, H, W)).astype(np.int32)),
        "obj_num": jnp.asarray(np.full((b,), 2, np.int32)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=str, default="1,2,4")
    ap.add_argument("--crop", type=int, default=465)
    ap.add_argument("--seq", type=int, default=5)
    ap.add_argument("--dtype", type=str, default="f32")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []
    for b in [int(x) for x in args.bs.split(",")]:
      try:
        cfg = resnet101_aocnet().replace(
            DATA_RANDOMCROP=(args.crop, args.crop),
            DATA_CURR_SEQ_LEN=args.seq,
            TRAIN_BATCH_SIZE=b,
            TRAIN_COMPUTE_DTYPE=("bfloat16" if args.dtype == "bf16"
                                 else "float32"),
            TRAIN_AUTO_RESUME=False,
            PRETRAIN=False,
            MESH_DATA_AXIS=1,
        )
        t0 = time.perf_counter()
        tr = Trainer(cfg)
        batch = make_batch(b, args.crop, args.seq, rng)
        # FLOPs of the COMPILED step (XLA cost analysis; counts the
        # fwd+bwd+optimizer graph as compiled, incl. remat recompute)
        step_jit = tr._build_step()
        from rvos_tpu.parallel.mesh import ambient_mesh_ctx
        with ambient_mesh_ctx(tr.mesh):
            lowered = step_jit.lower(tr.state, batch, key)
            compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        print(f"bs={b}: init+compile {time.perf_counter()-t0:.1f}s, "
              f"flops/step {flops/1e12:.2f} T", flush=True)

        # warm twice (layout respecialization), then chain 5 steps with
        # ONE final sync (block_until_ready lies through the tunnel)
        for i in range(2):
            m = tr.train_step(batch, jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            m = tr.train_step(batch, jax.random.fold_in(key, 10 + i))
        loss = float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / n
        mfu_f32 = flops / dt / PEAK["f32"]
        mfu_bf16 = flops / dt / PEAK["bf16"]
        rec = {"bs": b, "s_per_step": round(dt, 4),
               "samples_per_s": round(b / dt, 3),
               "tflops_per_step": round(flops / 1e12, 2),
               "hw_tflops_per_s": round(flops / dt / 1e12, 2),
               "mfu_vs_f32_peak": round(mfu_f32, 4),
               "mfu_vs_bf16_peak": round(mfu_bf16, 4),
               "loss": round(loss, 4)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        del tr, batch, step_jit, compiled
      except Exception as e:          # e.g. HBM OOM at large bs: record
        print(json.dumps({"bs": b, "error": f"{type(e).__name__}: "
                          f"{str(e)[:300]}"}), flush=True)

    if len(rows) > 1:
        base = rows[0]
        for r in rows[1:]:
            eff = (r["samples_per_s"] / base["samples_per_s"]) \
                / (r["bs"] / base["bs"])
            print(f"bs {base['bs']}->{r['bs']}: throughput x"
                  f"{r['samples_per_s']/base['samples_per_s']:.2f} "
                  f"(scaling efficiency {eff:.2f})", flush=True)


if __name__ == "__main__":
    main()
