"""rvos_tpu — a TPU-native robust video object segmentation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
JerryX1110/Robust-Video-Object-Segmentation (AOC-Net, ACM MM 2022):

* ResNet-101-DeepLabv3+ backbone + 100-d semantic embedding head
  (reference: ``networks/deeplab/*``, ``networks/aoc/aocnet.py:19-25``)
* CFBI-style global / local pixel-wise NN matching, adaptive-object-proxy
  (AOP) cluster matching and single-proxy matching
  (reference: ``networks/layers/matching.py``)
* Conditional mask calibration decoder with proxy-conditioned
  conditioning blocks and a 2-slot feature memory
  (reference: ``networks/aoc/decoding_module.py``, ``conditioning_layer.py``)
* Streaming RPA evaluator with an uncertainty-filtered memory bank
  (reference: ``networks/engine/eval_manager_mm.py``)
* Two-stage distributed training (data-parallel mesh instead of DDP/NCCL)
  (reference: ``networks/engine/train_manager_mm.py``)
* Robust-VOS-Benchmark perturbation dataloaders
  (reference: ``Robust-VOS-Benchmark/``)

Everything is re-architected TPU-first: static shapes (pad + mask, never
``masked_select``), a fixed ``MAX_OBJ`` object axis, a fixed-capacity
memory bank, on-device fixed-iteration k-means, and fused Pallas kernels
for the matching hot path.
"""

__version__ = "0.1.0"
