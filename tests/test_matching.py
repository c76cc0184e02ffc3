"""Matching kernels vs dense numpy oracles.

The oracles implement the reference semantics directly (squared-L2 with
the Gram trick, +5e4 wrong-label penalty, masked window mins) — the
reference's own dual implementations (chunked vs unchunked, parallel vs
loop, matching.py:200-249/2664-2752) are the model for this strategy.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rvos_tpu.ops.matching import (
    WRONG_LABEL_PADDING_DISTANCE,
    foreground2background,
    global_matching_bank,
    local_matching_bank,
    proxy_matching,
    squash_distance,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _squash(d, bias):
    return (_sigmoid(d + bias) - 0.5) * 2.0


def _dense_global_oracle(q, refs, labs, slot_valid, bias):
    """q:[H,W,C]; refs:[S,H,W,C]; labs:[S,H,W,O] -> [H,W,O,1]."""
    h, w, c = q.shape
    s = refs.shape[0]
    o = labs.shape[-1]
    qf = q.reshape(-1, c)
    rf = refs.reshape(-1, c)
    lf = (labs * slot_valid[:, None, None, None]).reshape(-1, o)
    d = ((qf[:, None, :] - rf[None, :, :]) ** 2).sum(-1)      # [M, R]
    pen = (1.0 - lf) * WRONG_LABEL_PADDING_DISTANCE
    dm = (d[:, :, None] + pen[None]).min(axis=1)              # [M, O]
    out = _squash(dm.reshape(h, w, o, 1), bias[None, None, :, None])
    return out


def make_case(rng, h=9, w=11, c=8, o=3, s=2):
    q = rng.standard_normal((h, w, c)).astype(np.float32)
    refs = rng.standard_normal((s, h, w, c)).astype(np.float32)
    lab_ids = rng.integers(0, o, size=(s, h, w))
    labs = np.eye(o, dtype=np.float32)[lab_ids]
    slot_valid = np.ones((s,), np.float32)
    bias = rng.standard_normal((o,)).astype(np.float32) * 0.1
    return q, refs, labs, slot_valid, bias


def test_global_matching_matches_oracle(rng):
    q, refs, labs, sv, bias = make_case(rng)
    got = np.asarray(global_matching_bank(
        jnp.asarray(q), jnp.asarray(refs), jnp.asarray(labs),
        jnp.asarray(sv), jnp.asarray(bias), tile_r=13))
    want = _dense_global_oracle(q, refs, labs, sv, bias)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_global_matching_invalid_slot_ignored(rng):
    q, refs, labs, sv, bias = make_case(rng)
    # slot 1 invalid == oracle over slot 0 only
    sv2 = np.array([1.0, 0.0], np.float32)
    got = np.asarray(global_matching_bank(
        jnp.asarray(q), jnp.asarray(refs), jnp.asarray(labs),
        jnp.asarray(sv2), jnp.asarray(bias)))
    want = _dense_global_oracle(q, refs[:1], labs[:1], sv[:1], bias)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_global_matching_empty_object_saturates(rng):
    q, refs, labs, sv, bias = make_case(rng, o=4)
    labs[..., 3] = 0.0  # object 3 absent everywhere
    got = np.asarray(global_matching_bank(
        jnp.asarray(q), jnp.asarray(refs), jnp.asarray(labs),
        jnp.asarray(sv), jnp.asarray(bias)))
    assert np.all(got[..., 3, :] > 0.999)


def test_proxy_matching_matches_oracle(rng):
    h, w, c, o = 7, 9, 8, 3
    q = rng.standard_normal((h, w, c)).astype(np.float32)
    p = rng.standard_normal((o, c)).astype(np.float32)
    bias = rng.standard_normal((o,)).astype(np.float32) * 0.1
    got = np.asarray(proxy_matching(jnp.asarray(q), jnp.asarray(p),
                                    jnp.asarray(bias)))
    d = ((q.reshape(-1, 1, c) - p[None]) ** 2).sum(-1).reshape(h, w, o, 1)
    want = _squash(d, bias[None, None, :, None])
    np.testing.assert_allclose(got, want, atol=1e-4)


def _dense_local_oracle(x, y, onehot, bias, radii, atrous_rate=1):
    """No-downsample dense oracle on the (possibly already small) grid."""
    h, w, c = x.shape
    o = onehot.shape[-1]
    D = radii[-1]
    pad_d = D - D % atrous_rate
    k = 2 * (pad_d // atrous_rate) + 1
    ypad = np.pad(y, ((pad_d, pad_d), (pad_d, pad_d), (0, 0)))
    y2pad = np.pad((y ** 2).sum(-1), pad_d,
                   constant_values=WRONG_LABEL_PADDING_DISTANCE)
    lpad = np.pad(onehot, ((pad_d, pad_d), (pad_d, pad_d), (0, 0)))
    x2 = (x ** 2).sum(-1)
    d = np.zeros((h, w, k, k, o), np.float32)
    for iy in range(k):
        for ix in range(k):
            ys = ypad[iy * atrous_rate: iy * atrous_rate + h,
                      ix * atrous_rate: ix * atrous_rate + w]
            y2s = y2pad[iy * atrous_rate: iy * atrous_rate + h,
                        ix * atrous_rate: ix * atrous_rate + w]
            ls = lpad[iy * atrous_rate: iy * atrous_rate + h,
                      ix * atrous_rate: ix * atrous_rate + w]
            dist = x2 + y2s - 2.0 * (x * ys).sum(-1)
            for oo in range(o):
                d[:, :, iy, ix, oo] = np.where(ls[..., oo] > 0.9, dist,
                                               WRONG_LABEL_PADDING_DISTANCE)
    a_max = pad_d // atrous_rate
    maps = [d.reshape(h, w, -1, o).min(axis=2)]
    for r in radii[:-1]:
        rr = r // atrous_rate
        sub = d[:, :, a_max - rr:a_max + rr + 1, a_max - rr:a_max + rr + 1, :]
        maps.append(sub.reshape(h, w, -1, o).min(axis=2))
    out = np.stack(maps, axis=-1)                     # [h, w, O, n]
    return _squash(out, bias[None, None, :, None])


def test_local_matching_matches_oracle(rng):
    h, w, c, o = 13, 15, 6, 3
    radii = (1, 2, 3)
    x = rng.standard_normal((h, w, c)).astype(np.float32)
    y = rng.standard_normal((h, w, c)).astype(np.float32)
    lab_ids = rng.integers(0, o, size=(h, w))
    onehot = np.eye(o, dtype=np.float32)[lab_ids]
    bias = rng.standard_normal((o,)).astype(np.float32) * 0.1
    got = np.asarray(local_matching_bank(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(onehot),
        jnp.asarray(bias), radii, allow_downsample=False))
    want = _dense_local_oracle(x, y, onehot, bias, radii)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_local_matching_downsample_shapes(rng):
    h, w, c, o = 21, 17, 6, 2
    x = rng.standard_normal((h, w, c)).astype(np.float32)
    y = rng.standard_normal((h, w, c)).astype(np.float32)
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(h, w))]
    bias = np.zeros((o,), np.float32)
    got = local_matching_bank(jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(onehot), jnp.asarray(bias),
                              (2, 4), allow_downsample=True)
    assert got.shape == (h, w, o, 2)
    assert np.all(np.isfinite(np.asarray(got)))


def test_foreground2background(rng):
    h, w, o, k = 5, 6, 4, 2
    dis = rng.uniform(0, 1, size=(h, w, o, k)).astype(np.float32)
    valid = np.array([1, 1, 1, 0], np.float32)
    got = np.asarray(foreground2background(jnp.asarray(dis), jnp.asarray(valid)))
    for i in range(3):
        others = [j for j in range(3) if j != i]
        want = dis[:, :, others, :].min(axis=2)
        np.testing.assert_allclose(got[:, :, i, :], want, atol=1e-6)


def test_foreground2background_single_object_passthrough(rng):
    dis = rng.uniform(0, 1, size=(4, 4, 3, 1)).astype(np.float32)
    valid = np.array([1, 0, 0], np.float32)
    got = np.asarray(foreground2background(jnp.asarray(dis), jnp.asarray(valid)))
    np.testing.assert_allclose(got, dis)


def test_pallas_kernel_interpret_matches_xla(rng):
    from rvos_tpu.ops.pallas_matching import global_matching_pallas
    from rvos_tpu.ops.matching import _global_matching_xla
    m, r, c, o = 70, 130, 12, 3
    q = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((r, c)).astype(np.float32))
    lab = jnp.asarray(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))])
    got = np.asarray(global_matching_pallas(q, re, lab, interpret=True,
                                            mixed=False))
    want = np.asarray(_global_matching_xla(q, re, lab, tile_r=64))
    np.testing.assert_allclose(got, want, atol=1e-3)
    # mixed precision stays within bf16 cross-term error
    got_mx = np.asarray(global_matching_pallas(q, re, lab, interpret=True,
                                               mixed=True))
    np.testing.assert_allclose(got_mx, want, atol=0.2, rtol=0.05)


def test_compact_reference_bank_exact(rng):
    from rvos_tpu.ops.matching import compact_reference_bank
    r, c, o = 200, 8, 3
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.zeros((r, o), np.float32)
    fg_idx = rng.choice(r, 40, replace=False)
    lab[fg_idx, rng.integers(1, o, size=40)] = 1.0
    ce, cl = compact_reference_bank(jnp.asarray(emb), jnp.asarray(lab), 64)
    assert ce.shape == (64, c)
    # all 40 fg pixels retained
    got_fg = np.asarray(cl).sum()
    assert got_fg == 40
    # matching over compacted == matching over full bank
    q = rng.standard_normal((5, 6, c)).astype(np.float32)
    bias = np.zeros((o,), np.float32)
    from rvos_tpu.ops.matching import global_matching_flat
    full = np.asarray(global_matching_flat(jnp.asarray(q), jnp.asarray(emb),
                                           jnp.asarray(lab), jnp.asarray(bias)))
    comp = np.asarray(global_matching_flat(jnp.asarray(q), ce, cl,
                                           jnp.asarray(bias)))
    # foreground objects identical; empty objects saturate either way
    np.testing.assert_allclose(comp[..., 1:, :], full[..., 1:, :], atol=1e-5)


def test_compact_reference_bank_overflow(rng):
    from rvos_tpu.ops.matching import compact_reference_bank
    r, c, o = 100, 4, 2
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.zeros((r, o), np.float32)
    lab[:, 1] = 1.0       # everything fg
    ce, cl = compact_reference_bank(jnp.asarray(emb), jnp.asarray(lab), 32)
    assert ce.shape == (32, c)
    assert np.asarray(cl)[:, 1].sum() == 32   # all selected are fg


def test_pallas_local_matching_interpret_matches_xla(rng):
    from rvos_tpu.ops.pallas_local import local_matching_pallas
    h, w, c, o = 13, 15, 6, 3
    radii = (1, 2, 3)
    x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    onehot = jnp.asarray(np.eye(o, dtype=np.float32)[
        rng.integers(0, o, size=(h, w))])
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1)
    got_raw = np.asarray(local_matching_pallas(x, y, onehot, radii, 1,
                                               interpret=True))
    got = _squash(got_raw, np.asarray(bias)[None, None, :, None])
    want = np.asarray(local_matching_bank(x, y, onehot, bias, radii,
                                          allow_downsample=False))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_global_matching_custom_vjp_grads(rng):
    """Custom VJP (argmin-pair gradient) vs autodiff of the dense oracle."""
    import jax
    from rvos_tpu.ops.matching import global_matching_min
    m_, r_, c_, o_ = 12, 17, 5, 2
    q = jnp.asarray(rng.standard_normal((m_, c_)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((r_, c_)).astype(np.float32))
    lab = jnp.asarray(np.eye(o_, dtype=np.float32)[
        rng.integers(0, o_, size=(r_,))])

    def dense(q, re):
        d = jnp.sum((q[:, None] - re[None]) ** 2, -1)
        pen = (1.0 - lab) * WRONG_LABEL_PADDING_DISTANCE
        return jnp.min(d[:, :, None] + pen[None], axis=1)

    w = jnp.asarray(rng.standard_normal((m_, o_)).astype(np.float32))
    f_custom = lambda q, re: jnp.sum(global_matching_min(q, re, lab) * w)
    f_dense = lambda q, re: jnp.sum(dense(q, re) * w)
    np.testing.assert_allclose(float(f_custom(q, re)), float(f_dense(q, re)),
                               rtol=1e-4)
    gq_c, gr_c = jax.grad(f_custom, argnums=(0, 1))(q, re)
    gq_d, gr_d = jax.grad(f_dense, argnums=(0, 1))(q, re)
    np.testing.assert_allclose(np.asarray(gq_c), np.asarray(gq_d),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gr_c), np.asarray(gr_d),
                               atol=1e-3, rtol=1e-3)


def test_segmented_compaction_quota_and_equivalence(rng):
    from rvos_tpu.ops.matching import (compact_reference_bank_segmented,
                                       global_matching_flat,
                                       segmented_quota)
    r, c, o = 600, 8, 3
    tile = 64
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.zeros((r, o), np.float32)
    # bg-heavy bank: 500 bg pixels, a tiny object 1, medium object 2
    lab[:500, 0] = 1.0
    lab[500:510, 1] = 1.0
    lab[510:, 2] = 1.0
    ce, cl = compact_reference_bank_segmented(jnp.asarray(emb),
                                              jnp.asarray(lab), 192,
                                              tile=tile)
    quota = segmented_quota(192, o, tile)
    assert ce.shape == (o * quota, c)
    cl_np = np.asarray(cl)
    # per-object segments: rows [i*quota,(i+1)*quota) only carry label i
    for i in range(o):
        seg = cl_np[i * quota:(i + 1) * quota]
        assert seg[:, [j for j in range(o) if j != i]].sum() == 0
    # the tiny object keeps ALL 10 of its pixels (no bg starvation)
    assert cl_np[1 * quota:2 * quota, 1].sum() == 10
    # XLA matching over the segmented bank == over the full bank for
    # objects whose pixels all fit their quota
    q = rng.standard_normal((4, 5, c)).astype(np.float32)
    bias = np.zeros((o,), np.float32)
    full = np.asarray(global_matching_flat(jnp.asarray(q), jnp.asarray(emb),
                                           jnp.asarray(lab),
                                           jnp.asarray(bias)))
    comp = np.asarray(global_matching_flat(jnp.asarray(q), ce, cl,
                                           jnp.asarray(bias)))
    np.testing.assert_allclose(comp[..., 1:2, :], full[..., 1:2, :],
                               atol=1e-5)


def test_segmented_pallas_kernel_interpret_matches_xla(rng):
    from rvos_tpu.ops.pallas_matching import (_TR_SEG,
                                              global_matching_pallas_segmented)
    from rvos_tpu.ops.matching import (_global_matching_xla, squash_distance,
                                       global_matching_flat_segmented)
    o, c = 3, 12
    quota = _TR_SEG
    p = o * quota
    m = 70
    q = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    emb = rng.standard_normal((p, c)).astype(np.float32)
    lab = np.zeros((p, o), np.float32)
    # object segments partially filled (filler rows stay all-zero)
    lab[0:400, 0] = 1.0
    lab[quota:quota + 37, 1] = 1.0
    lab[2 * quota:2 * quota + quota, 2] = 1.0
    bias_rows = np.full((p,), 0.0, np.float32)
    seg_obj = np.repeat(np.arange(o), quota)
    bias_rows = (1.0 - lab[np.arange(p), seg_obj]) * 5e4
    got = np.asarray(global_matching_pallas_segmented(
        q, jnp.asarray(emb), jnp.asarray(bias_rows), n_obj=o,
        interpret=True, mixed=False))
    want = np.asarray(_global_matching_xla(q, jnp.asarray(emb),
                                           jnp.asarray(lab), tile_r=128))
    np.testing.assert_allclose(got, want, atol=1e-3)
    # the full wrapper (bias derived from labels) agrees after squashing
    dis_bias = jnp.zeros((o,), jnp.float32)
    qhw = q.reshape(7, 10, c)
    got_sq = np.asarray(global_matching_flat_segmented(
        qhw, jnp.asarray(emb), jnp.asarray(lab), dis_bias, mixed=False,
        interpret=True))
    want_sq = np.asarray(squash_distance(
        jnp.asarray(want).reshape(7, 10, o)[..., None], dis_bias))
    np.testing.assert_allclose(got_sq, want_sq, atol=1e-3)


def test_segmented_kernel_ytb_object_count(rng):
    """O=11 (YTB MAX_OBJ 10 + bg): quota falls to one tile per object —
    exercises the tiles_per_obj=1 and op-padding (16) kernel config."""
    from rvos_tpu.ops.matching import (compact_reference_bank_segmented,
                                       _global_matching_xla)
    from rvos_tpu.ops.pallas_matching import global_matching_pallas_segmented
    o, c = 11, 12
    r = 3000
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))]
    se, sl = compact_reference_bank_segmented(jnp.asarray(emb),
                                              jnp.asarray(lab), 16384)
    p = se.shape[0]
    assert p == o * 1024 and p % 1024 == 0
    seg_obj = np.repeat(np.arange(o), p // o)
    bias = (1.0 - np.asarray(sl)[np.arange(p), seg_obj]) * 5e4
    q = jnp.asarray(rng.standard_normal((40, c)).astype(np.float32))
    got = np.asarray(global_matching_pallas_segmented(
        q, se, jnp.asarray(bias.astype(np.float32)), n_obj=o,
        interpret=True, mixed=False))
    want = np.asarray(_global_matching_xla(q, se, sl, tile_r=512))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_occupancy_bank_dominant_object_exact(rng):
    """VERDICT r2 weak #6 / ADVICE r2: a dominant object whose pixels
    far exceed the uniform per-object quota keeps ALL of them under the
    occupancy layout (others near-empty), so its distance map is EXACT
    vs the full bank — where the uniform layout subsamples and errs."""
    from rvos_tpu.ops.matching import (compact_reference_bank_occupancy,
                                       compact_reference_bank_segmented,
                                       global_matching_flat)
    r, c, o = 800, 8, 4
    tile = 64
    max_pixels = 1024         # 16 tiles; uniform layout: 256 rows/object
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.zeros((r, o), np.float32)
    lab[:700, 1] = 1.0        # dominant object: 700 px >> 256-row quota
    lab[700:705, 2] = 1.0     # tiny object
    lab[705:707, 3] = 1.0     # tinier object; channel 0 (bg) empty

    oe, ol, tobj = compact_reference_bank_occupancy(
        jnp.asarray(emb), jnp.asarray(lab), max_pixels, tile=tile)
    n_tiles = max_pixels // tile
    assert tobj.shape == (n_tiles,)
    assert oe.shape == (n_tiles * tile, c)
    tobj_np = np.asarray(tobj)
    ol_np = np.asarray(ol)
    # tiles are label-pure under the map
    for t in range(n_tiles):
        seg = ol_np[t * tile:(t + 1) * tile]
        others = [j for j in range(o) if j != tobj_np[t]]
        assert seg[:, others].sum() == 0
    # occupancy allocation: the dominant object gets enough tiles to
    # keep EVERY pixel; the tiny objects keep theirs; bg gets nothing
    assert (tobj_np == 1).sum() >= 11
    assert ol_np[:, 1].sum() == 700
    assert ol_np[:, 2].sum() == 5 and ol_np[:, 3].sum() == 2
    assert ol_np[:, 0].sum() == 0

    q = rng.standard_normal((6, 7, c)).astype(np.float32)
    bias = np.zeros((o,), np.float32)
    full = np.asarray(global_matching_flat(
        jnp.asarray(q), jnp.asarray(emb), jnp.asarray(lab),
        jnp.asarray(bias)))
    occ = np.asarray(global_matching_flat(jnp.asarray(q), oe, ol,
                                          jnp.asarray(bias)))
    # every live channel EXACT vs the full bank (no pixels dropped —
    # the reference-parity property the uniform layout loses on skew)
    np.testing.assert_allclose(occ[..., 1:, :], full[..., 1:, :],
                               atol=1e-5)
    # the uniform layout demonstrably errs on the dominant object here
    se, sl = compact_reference_bank_segmented(
        jnp.asarray(emb), jnp.asarray(lab), max_pixels, tile=tile)
    assert np.asarray(sl)[:, 1].sum() < 700       # capped at its quota
    uni = np.asarray(global_matching_flat(jnp.asarray(q), se, sl,
                                          jnp.asarray(bias)))
    err_uni = np.abs(uni[..., 1, 0] - full[..., 1, 0]).max()
    assert err_uni > 0


def test_occupancy_mapped_kernel_interpret_matches_xla(rng):
    """The scalar-prefetch occupancy kernel == the XLA online-min over
    the identical occupancy-compacted rows (interpret mode)."""
    from rvos_tpu.ops.matching import (_global_matching_xla,
                                       compact_reference_bank_occupancy,
                                       global_matching_flat_segmented,
                                       squash_distance)
    from rvos_tpu.ops.pallas_matching import (
        global_matching_pallas_segmented_mapped)
    r, c, o = 4000, 12, 3
    emb = rng.standard_normal((r, c)).astype(np.float32)
    lab = np.zeros((r, o), np.float32)
    lab[:3000, 1] = 1.0
    lab[3000:3040, 2] = 1.0
    oe, ol, tobj = compact_reference_bank_occupancy(
        jnp.asarray(emb), jnp.asarray(lab), 4096, tile=1024)
    p = oe.shape[0]
    row_obj = np.repeat(np.asarray(tobj), p // tobj.shape[0])
    bias = (1.0 - np.asarray(ol)[np.arange(p), row_obj]) * 5e4
    q = jnp.asarray(rng.standard_normal((50, c)).astype(np.float32))
    got = np.asarray(global_matching_pallas_segmented_mapped(
        q, oe, jnp.asarray(bias.astype(np.float32)), tobj, n_obj=o,
        interpret=True, mixed=False))
    want = np.asarray(_global_matching_xla(q, oe, ol, tile_r=512))
    # channel 0 (no pixels, no tiles): kernel saturates at _EMPTY_DIST,
    # XLA at ~5e4 — both squash to 1.0; compare live channels directly
    np.testing.assert_allclose(got[:, 1:], want[:, 1:], atol=1e-3)
    dis_bias = jnp.zeros((o,), jnp.float32)
    got_sq = np.asarray(global_matching_flat_segmented(
        q.reshape(5, 10, c), oe, ol, dis_bias, mixed=False,
        interpret=True, tile_obj=tobj))
    want_sq = np.asarray(squash_distance(
        jnp.asarray(want).reshape(5, 10, o)[..., None], dis_bias))
    np.testing.assert_allclose(got_sq, want_sq, atol=1e-3)
