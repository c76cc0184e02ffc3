#!/usr/bin/env bash
# Robust-VOS-Benchmark sweep (the paper's robustness pilot workflow,
# Robust-VOS-Benchmark/ + SURVEY.md §3.4): evaluate clean (p=0) and all
# nine perturbations — Gaussian noise sigma {5,10,30} (1-3), blur
# k {3,5,9} (4-6), salt-pepper {1k,1k,5k} points (7-9) — with J&F, then
# print the per-perturbation table incl. degradation vs clean.
#
# Usage: scripts/robust_eval.sh OUT_ROOT [extra eval-CLI args...]
set -e
OUT=${1:?usage: robust_eval.sh OUT_ROOT [eval args...]}
shift
for p in 0 1 2 3 4 5 6 7 8 9; do
  python -m rvos_tpu.cli.eval --perturb "$p" --jf \
    --out "$OUT/p$p/Annotations" "$@"
done
python - "$OUT" <<'EOF'
import csv, os, sys
out = sys.argv[1]
names = {0: "clean", 1: "noise s5", 2: "noise s10", 3: "noise s30",
         4: "blur k3", 5: "blur k5", 6: "blur k9",
         7: "s&p 1k", 8: "s&p 1k", 9: "s&p 5k"}
scores = {}
for p in range(10):
    path = os.path.join(out, f"p{p}", "Annotations_global_results.csv")
    if not os.path.exists(path):
        continue
    with open(path) as fh:
        rows = list(csv.reader(fh))
    scores[p] = float(rows[1][0])
clean = scores.get(0)
print(f"{'perturbation':<12} {'J&F':>8} {'delta':>8}")
for p, s in sorted(scores.items()):
    d = "" if clean is None or p == 0 else f"{s - clean:+.4f}"
    print(f"{names[p]:<12} {s:8.4f} {d:>8}")
EOF
