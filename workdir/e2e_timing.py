"""Run the e2e bench sequence and print the per-stage wall attribution
evaluate_sequence now returns under "timing"."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import shutil

from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.datasets import VOSTestSeq
from rvos_tpu.engine.eval import Evaluator
from rvos_tpu.models.aocnet import init_model

cfg = resnet101_aocnet().replace(
    MODEL_MAX_OBJ_NUM=4, TEST_BANK_CAPACITY=4, USE_PALLAS=True)
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
ev = Evaluator(cfg, model, variables)

root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "workdir", "bench_e2e")
img_root = os.path.join(root, "JPEGImages")
lab_root = os.path.join(root, "Annotations")
N = 104
names = [f"{i:05d}.jpg" for i in range(N)]
# fixture (workdir/ is gitignored and wiped between rounds): same
# generator as bench._e2e_bench
if not all(os.path.exists(os.path.join(img_root, "bench_seq", n))
           for n in names):
    import numpy as np
    from PIL import Image
    from rvos_tpu.utils.image import save_mask
    os.makedirs(os.path.join(img_root, "bench_seq"), exist_ok=True)
    _r = np.random.default_rng(7)
    _base = _r.integers(0, 256, (480, 854, 3), dtype=np.uint8)
    for _i, _n in enumerate(names):
        Image.fromarray(np.roll(_base, shift=3 * _i, axis=1)).save(
            os.path.join(img_root, "bench_seq", _n), quality=90)
    _lab = np.zeros((480, 854), np.uint8)
    _lab[100:240, 100:300] = 1
    _lab[250:400, 150:350] = 2
    _lab[100:240, 400:600] = 3
    save_mask(_lab, os.path.join(lab_root, "bench_seq", "00000.png"))
save_dir = os.path.join(root, "out")
shutil.rmtree(save_dir, ignore_errors=True)
os.makedirs(save_dir, exist_ok=True)

for tag, n in (("warm", 8), ("meas", N), ("meas2", N)):
    ds = VOSTestSeq(img_root, lab_root, "bench_seq", names[:n],
                    ["00000.png"], True, False, None)
    out = ev.evaluate_sequence(ds, save_dir=save_dir)
    t = out["timing"]
    n_f = out["frames"]
    per = {k: f"{v / max(n_f, 1) * 1e3:.1f}" for k, v in t.items()}
    print(f"[{tag}] fps {out['fps']:.2f}  ref-acct {out['fps_ref']:.2f}  "
          f"time {out['time']:.2f}s "
          f"frames {n_f}  ms/frame: {per}", flush=True)
