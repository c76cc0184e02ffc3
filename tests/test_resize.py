"""Resize ops vs torch's interpolate (the reference's sampling grids)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rvos_tpu.ops.resize import resize_hw


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("shape", [((17, 23), (33, 45)), ((33, 45), (17, 23)),
                                   ((8, 8), (8, 8))])
def test_align_corners_matches_torch(rng, mode, shape):
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((h, w, 3)).astype(np.float32)
    out = np.asarray(resize_hw(x, (oh, ow), mode))
    xt = torch.from_numpy(x).permute(2, 0, 1).unsqueeze(0)
    ref = F.interpolate(xt, size=(oh, ow), mode=mode, align_corners=True)
    ref = ref.squeeze(0).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("shape", [((30, 40), (15, 21)), ((15, 21), (30, 40))])
def test_nearest_matches_torch(rng, shape):
    (h, w), (oh, ow) = shape
    x = rng.integers(0, 5, size=(h, w, 1)).astype(np.float32)
    out = np.asarray(resize_hw(x, (oh, ow), "nearest"))
    xt = torch.from_numpy(x).permute(2, 0, 1).unsqueeze(0)
    ref = F.interpolate(xt, size=(oh, ow), mode="nearest")
    ref = ref.squeeze(0).permute(1, 2, 0).numpy()
    np.testing.assert_array_equal(out, ref)


def test_int_labels_roundtrip(rng):
    lab = rng.integers(0, 7, size=(20, 30, 1)).astype(np.int32)
    out = np.asarray(resize_hw(lab, (11, 17), "nearest"))
    assert out.dtype == np.int32
    assert set(np.unique(out)) <= set(np.unique(lab))
