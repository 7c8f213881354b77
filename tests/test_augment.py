"""Augmentation ops vs OpenCV (the reference's backend) as oracle."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from deeplab_tpu.data import augment as A


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (37, 53, 3), np.uint8)


@pytest.fixture(scope="module")
def gray():
    rng = np.random.RandomState(1)
    return rng.randint(0, 21, (37, 53), np.uint8)


def _close(a, b, tol=1):
    a = a.astype(np.int32)
    b = b.astype(np.int32)
    frac_off = np.mean(np.abs(a - b) > tol)
    return frac_off


def test_resize_bilinear_matches_cv2(img):
    ours = A.resize_bilinear(img, (64, 48))
    ref = cv2.resize(img, (64, 48))
    # integer rounding can differ by 1 on a few pixels
    assert _close(ours, ref, tol=1) < 0.02


def test_resize_nearest_matches_cv2(gray):
    ours = A.resize_nearest(gray, (64, 48))
    ref = cv2.resize(gray, (64, 48), interpolation=cv2.INTER_NEAREST)
    assert np.mean(ours != ref) < 0.05  # boundary-pixel choice may differ


def test_flips_match_cv2(img):
    np.testing.assert_array_equal(A.flip_horizontal(img), cv2.flip(img, 1))
    np.testing.assert_array_equal(A.flip_vertical(img), cv2.flip(img, 0))


def test_gamma_lut_matches_cv2(img):
    table = A.gamma_lut(1.37)
    np.testing.assert_array_equal(A.apply_lut(img, table),
                                  cv2.LUT(img, table))


def test_rotation_matrix_matches_cv2():
    M_ours = A.rotation_matrix((26, 18), 5.3, 1.08)
    M_ref = cv2.getRotationMatrix2D((26, 18), 5.3, 1.08)
    np.testing.assert_allclose(M_ours, M_ref, atol=1e-9)


def test_warp_affine_matches_cv2(img):
    M = cv2.getRotationMatrix2D((26, 18), 7.0, 1.1)
    ours = A.warp_affine(img, M, (53, 37))
    ref = cv2.warpAffine(img, M, (53, 37))
    assert _close(ours, ref, tol=2) < 0.05


def test_warp_affine_label_bilinear(gray):
    # the reference warps labels with default INTER_LINEAR (utils.py:353)
    M = cv2.getRotationMatrix2D((26, 18), 3.0, 1.02)
    ours = A.warp_affine(gray, M, (53, 37))
    ref = cv2.warpAffine(gray, M, (53, 37))
    assert _close(ours, ref, tol=1) < 0.05


def test_gaussian_blur_matches_cv2(img):
    ours = A.gaussian_blur(img, 5)
    ref = cv2.GaussianBlur(img, (5, 5), 0)
    assert _close(ours, ref, tol=1) < 0.01


def test_bgr_yuv_roundtrip_matches_cv2(img):
    yuv_ours = A.bgr_to_yuv(img)
    yuv_ref = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)
    assert _close(yuv_ours, yuv_ref, tol=1) < 0.02
    bgr_ours = A.yuv_to_bgr(yuv_ref)
    bgr_ref = cv2.cvtColor(yuv_ref, cv2.COLOR_YUV2BGR)
    assert _close(bgr_ours, bgr_ref, tol=2) < 0.05


def test_clahe_matches_cv2():
    rng = np.random.RandomState(3)
    # use a tile-aligned size; cv2's border handling differs otherwise
    ch = rng.randint(0, 256, (64, 64), np.uint8)
    ours = A.clahe(ch, 2.0, (8, 8))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(ch)
    assert _close(ours, ref, tol=2) < 0.05


def test_clahe_bgr_stays_bgr(img):
    out = A.clahe_bgr(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    yuv = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)
    yuv[:, :, 0] = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(
        yuv[:, :, 0])
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR)
    assert _close(out, ref, tol=3) < 0.10
