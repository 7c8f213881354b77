"""Native C++ image ops (native/imgops.cpp) vs the numpy reference paths."""

import numpy as np
import pytest

from deeplab_tpu.data import augment as A
from deeplab_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libimgops.so not built")


@pytest.fixture(scope="module")
def img():
    return np.random.RandomState(0).randint(0, 256, (37, 53, 3), np.uint8)


@pytest.fixture(scope="module")
def gray():
    return np.random.RandomState(1).randint(0, 256, (37, 53), np.uint8)


def _numpy_path(fn, *args, **kw):
    """Run the augment fn with the native lib masked off."""
    lib, native._LIB = native._LIB, None
    try:
        return fn(*args, **kw)
    finally:
        native._LIB = lib


def test_resize_bilinear_parity(img):
    got = native.resize_bilinear(img, (64, 48))
    ref = _numpy_path(A.resize_bilinear, img, (64, 48))
    assert np.mean(np.abs(got.astype(int) - ref.astype(int)) > 1) < 0.01


def test_resize_nearest_parity(gray):
    got = native.resize_nearest(gray, (64, 48))
    ref = _numpy_path(A.resize_nearest, gray, (64, 48))
    np.testing.assert_array_equal(got, ref)


def test_flip_parity(img):
    np.testing.assert_array_equal(native.flip(img, 1), img[:, ::-1])
    np.testing.assert_array_equal(native.flip(img, 0), img[::-1])


def test_lut_parity(img):
    table = A.gamma_lut(1.4)
    np.testing.assert_array_equal(native.apply_lut(img, table), table[img])


def test_warp_affine_parity(img, gray):
    M = A.rotation_matrix((26, 18), 7.0, 1.1)
    got = native.warp_affine(img, M, (53, 37))
    ref = _numpy_path(A.warp_affine, img, M, (53, 37))
    assert np.mean(np.abs(got.astype(int) - ref.astype(int)) > 1) < 0.01
    got_n = native.warp_affine(gray, M, (53, 37), nearest=True)
    ref_n = _numpy_path(A.warp_affine, gray, M, (53, 37), nearest=True)
    assert np.mean(got_n != ref_n) < 0.01


def test_gaussian_blur_parity(img):
    got = native.gaussian_blur(img, 5)
    ref = _numpy_path(A.gaussian_blur, img, 5)
    assert np.mean(np.abs(got.astype(int) - ref.astype(int)) > 1) < 0.01


def test_color_conversion_parity(img):
    got = native.bgr_to_yuv(img)
    ref = _numpy_path(A.bgr_to_yuv, img)
    assert np.mean(np.abs(got.astype(int) - ref.astype(int)) > 1) < 0.01
    got2 = native.yuv_to_bgr(got)
    ref2 = _numpy_path(A.yuv_to_bgr, got)
    assert np.mean(np.abs(got2.astype(int) - ref2.astype(int)) > 1) < 0.01


def test_clahe_parity():
    ch = np.random.RandomState(3).randint(0, 256, (64, 64), np.uint8)
    got = native.clahe(ch, 2.0, (8, 8))
    ref = _numpy_path(A.clahe, ch, 2.0, (8, 8))
    assert np.mean(np.abs(got.astype(int) - ref.astype(int)) > 1) < 0.02


def test_native_is_faster():
    """The point of the native layer: beat numpy on the hot path."""
    import time
    img = np.random.RandomState(0).randint(0, 256, (512, 512, 3), np.uint8)
    M = A.rotation_matrix((256, 256), 5.0, 1.05)

    t0 = time.perf_counter()
    for _ in range(5):
        native.warp_affine(img, M, (512, 512))
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        _numpy_path(A.warp_affine, img, M, (512, 512))
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
