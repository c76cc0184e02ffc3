"""Native preprocessing library vs numpy semantics."""

import numpy as np
import pytest

from rvos_tpu import native
from rvos_tpu.data.transforms import normalize as np_normalize


def test_native_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    assert lib is not None


def test_normalize_matches_numpy(rng):
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    got = native.normalize(img)
    want = np_normalize(img)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_numpy(rng):
    lab = rng.integers(0, 5, (40, 60)).astype(np.uint8)
    got = native.resize_nearest_label(lab, (13, 17))
    sh, sw = lab.shape
    ys = np.minimum((np.arange(13) * (sh / 13)).astype(np.int64), sh - 1)
    xs = np.minimum((np.arange(17) * (sw / 17)).astype(np.int64), sw - 1)
    np.testing.assert_array_equal(got, lab[ys][:, xs])


def test_box_blur_matches_cv2(rng):
    if native.get_lib() is None:
        pytest.skip("no native lib")
    try:
        import cv2
    except ImportError:
        pytest.skip("no cv2")
    img = rng.uniform(0, 255, (31, 29, 3)).astype(np.float32)
    got = native.box_blur(img, 3)
    want = cv2.blur(img, (3, 3))
    # interiors must match exactly; borders use replicate like cv2 default
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-3)


def test_noise_ops_run(rng):
    img = rng.uniform(0, 255, (20, 20, 3)).astype(np.float32)
    noisy = native.gaussian_noise(img, 10.0, seed=1)
    assert noisy.shape == img.shape
    assert 0 <= noisy.min() and noisy.max() <= 255
    sp = native.salt_pepper(img, 50, seed=2)
    assert ((sp == 255.0).all(axis=-1) | (sp == 0.0).all(axis=-1)).sum() >= 25
