"""Worker process for the 2-process CPU jax.distributed smoke test.

Launched twice by tests/test_distributed.py with RVOS_MULTIHOST /
RVOS_COORDINATOR / RVOS_NUM_PROCESSES / RVOS_PROCESS_ID set.  Validates
the full multi-host path end-to-end on CPU: distributed init → global
device mesh → per-process batch slicing (TrainBatcher) →
make_global_batch stitching → a jitted data-sharded reduction whose
result must equal the locally-computed global value on BOTH processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force CPU BEFORE any backend init (the hosted TPU plugin ignores the
# JAX_PLATFORMS env var — CLAUDE.md); 2 virtual devices per process
jax.config.update("jax_platforms", "cpu")

from rvos_tpu.parallel.distributed import (  # noqa: E402
    make_global_batch, maybe_initialize, process_batch_slice)


def main():
    assert maybe_initialize(), "RVOS_MULTIHOST not set?"
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 4, devs                  # 2 hosts x 2 local
    assert len(jax.local_devices()) == 2

    mesh = Mesh(np.array(devs), ("data",))

    # deterministic "dataset": item i is a constant-i image set
    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            img = np.full((4, 4, 3), float(i), np.float32)
            lab = np.full((4, 4), i % 3, np.uint8)
            return {"ref_img": img, "prev_img": img,
                    "curr_img": [img, img],
                    "ref_label": lab, "prev_label": lab,
                    "curr_label": [lab, lab],
                    "meta": {"obj_num": 2}}

    from rvos_tpu.data.loader import TrainBatcher

    pi, pc = jax.process_index(), jax.process_count()
    start, local = process_batch_slice(4, pi, pc)
    assert (start, local) == (pi * 2, 2)

    global_batcher = TrainBatcher(DS(), 4, lambda s: s, num_workers=1)
    local_batcher = TrainBatcher(DS(), 4, lambda s: s, num_workers=1,
                                 process_index=pi, process_count=pc)
    gb = next(global_batcher.epoch(0))           # full global batch
    lb = next(local_batcher.epoch(0))            # this process's slice
    np.testing.assert_array_equal(
        lb["ref_img"], gb["ref_img"][start:start + local])

    batch = make_global_batch(mesh, lb)
    assert batch["ref_img"].shape == (4, 4, 4, 3)        # global shape
    assert batch["curr_img"].shape == (2, 4, 4, 4, 3)    # time-major

    @jax.jit
    def reduce(b):
        return (b["ref_img"].mean(), b["curr_img"].mean(),
                b["ref_label"].astype(jax.numpy.float32).mean())

    got = [float(x) for x in reduce(batch)]
    want = [float(gb["ref_img"].mean()), float(gb["curr_img"].mean()),
            float(gb["ref_label"].astype(np.float32).mean())]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-6, (got, want)
    print(f"OK process {pi}: global mean {got[0]:.3f}", flush=True)


if __name__ == "__main__":
    main()
