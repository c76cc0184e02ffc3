"""Evaluator state machine units: ring-buffer bank, CLI parsers."""

import numpy as np
import jax.numpy as jnp

from rvos_tpu.engine.eval import _AugState


def test_ring_bank_pins_first_frame():
    st = _AugState(capacity=3, h=4, w=4, c=2, o=2, mem_hw=(2, 2), head_dim=8)
    e = lambda v: jnp.full((4, 4, 2), float(v))
    l = lambda v: jnp.full((4, 4), v, jnp.int32)
    st.add_ref(e(0), l(0), first=True)
    assert float(st.slot_valid[0]) == 1.0 and float(st.slot_valid[1]) == 0.0
    st.add_ref(e(1), l(1))
    st.add_ref(e(2), l(2))
    # capacity reached: next write wraps to slot 1, slot 0 untouched
    st.add_ref(e(3), l(3))
    assert float(st.ref_emb[0, 0, 0, 0]) == 0.0
    assert float(st.ref_emb[1, 0, 0, 0]) == 3.0
    assert float(st.ref_emb[2, 0, 0, 0]) == 2.0
    assert np.all(np.asarray(st.slot_valid) == 1.0)


def test_cli_parsers_build():
    from rvos_tpu.cli.eval import build_parser as eval_parser
    from rvos_tpu.cli.train import apply_args, build_parser as train_parser

    a = eval_parser().parse_args(["--dataset", "davis2017", "--mem_every", "5",
                                  "--ucr", "0.5", "--ms", "1.0", "1.3",
                                  "--flip", "--perturb", "3",
                                  "--min_matching_pixels", "4096"])
    assert a.dataset == "davis2017" and a.flip and a.perturb == 3
    # --min_matching_pixels (eval_net_mm_rpa.py:32 parity) maps onto the
    # fg-union bank-compaction cap; 0 disables, -1 keeps the preset
    from rvos_tpu.cli.eval import apply_args as eval_apply
    from rvos_tpu.configs import get_config as _gc
    ecfg = eval_apply(_gc("tiny_test"), a)
    assert ecfg.MATCHING_MAX_REF_PIXELS == 4096
    a0 = eval_parser().parse_args([])
    default_cap = _gc("tiny_test").MATCHING_MAX_REF_PIXELS
    assert eval_apply(_gc("tiny_test"), a0).MATCHING_MAX_REF_PIXELS \
        == default_cap

    t = train_parser().parse_args(["--total_step", "1000", "--lr", "0.2",
                                   "--gpu_num", "4", "--float16"])
    from rvos_tpu.configs import get_config
    cfg = apply_args(get_config("resnet101_aocnet"), t)
    assert cfg.TRAIN_TOTAL_STEPS == 1000
    assert cfg.TRAIN_START_SEQ_TRAINING_STEPS == 500
    assert cfg.TRAIN_LR == 0.2
    assert cfg.MESH_DATA_AXIS == 4
    assert cfg.MATCHING_DTYPE == "bfloat16"


def test_shard_view_round_robin():
    from rvos_tpu.cli.eval import _ShardView

    class _DS(list):
        pass

    ds = _DS(f"seq{i}" for i in range(7))
    shards = [_ShardView(ds, i, 3) for i in range(3)]
    assert [len(s) for s in shards] == [3, 2, 2]
    seen = [s[i] for s in shards for i in range(len(s))]
    assert sorted(seen) == sorted(ds)          # full cover, no overlap


def test_cli_shard_splits_sequences(tmp_path):
    """--shard_id/--shard_num: the two shards of the 3-sequence
    synthetic dataset must produce disjoint result dirs that together
    cover all sequences (multi-process eval, shared --out)."""
    import os

    from rvos_tpu.cli.eval import main

    outs = []
    for sid in range(2):
        out = str(tmp_path / f"s{sid}" / "Annotations")
        main(["--config", "tiny_test", "--synthetic", "--out", out,
              "--shard_id", str(sid), "--shard_num", "2"])
        outs.append({d for d in os.listdir(out)
                     if os.path.isdir(os.path.join(out, d))})
    assert outs[0] & outs[1] == set()
    assert outs[0] | outs[1] == {"test1", "test2", "test3"}
