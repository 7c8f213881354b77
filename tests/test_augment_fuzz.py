"""Randomized parity sweeps: augment ops vs cv2 across shapes and params."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from deeplab_tpu.data import augment as A

RNG = np.random.RandomState(1234)


def _frac_off(a, b, tol=1):
    return np.mean(np.abs(a.astype(np.int32) - b.astype(np.int32)) > tol)


@pytest.mark.parametrize("trial", range(8))
def test_resize_bilinear_random(trial):
    h, w = RNG.randint(8, 90, 2)
    oh, ow = RNG.randint(8, 90, 2)
    c = RNG.choice([1, 3])
    img = RNG.randint(0, 256, (h, w) + ((c,) if c == 3 else ()), np.uint8)
    ours = A.resize_bilinear(img, (ow, oh))
    ref = cv2.resize(img, (int(ow), int(oh)))
    assert _frac_off(ours, ref, 1) < 0.03, (h, w, oh, ow, c)


@pytest.mark.parametrize("trial", range(8))
def test_warp_affine_random(trial):
    h, w = RNG.randint(16, 80, 2)
    img = RNG.randint(0, 256, (h, w, 3), np.uint8)
    angle = float(RNG.uniform(-25, 25))
    scale = float(RNG.uniform(0.7, 1.4))
    cx, cy = int(w // 2), int(h // 2)
    M = cv2.getRotationMatrix2D((cx, cy), angle, scale)
    ours = A.warp_affine(img, M, (w, h))
    ref = cv2.warpAffine(img, M, (int(w), int(h)))
    assert _frac_off(ours, ref, 2) < 0.08, (h, w, angle, scale)


@pytest.mark.parametrize("trial", range(5))
def test_gamma_lut_random(trial):
    factor = float(RNG.uniform(0.3, 3.0))
    img = RNG.randint(0, 256, (31, 17, 3), np.uint8)
    table = A.gamma_lut(factor)
    np.testing.assert_array_equal(A.apply_lut(img, table),
                                  cv2.LUT(img, table))


@pytest.mark.parametrize("ksize", [3, 5, 7, 9])
def test_gaussian_blur_ksizes(ksize):
    img = RNG.randint(0, 256, (41, 37, 3), np.uint8)
    ours = A.gaussian_blur(img, ksize)
    ref = cv2.GaussianBlur(img, (ksize, ksize), 0)
    assert _frac_off(ours, ref, 1) < 0.03, ksize


@pytest.mark.parametrize("trial", range(4))
def test_clahe_random_tile_aligned(trial):
    th, tw = RNG.randint(2, 9, 2)
    h, w = th * RNG.randint(6, 12), tw * RNG.randint(6, 12)
    clip = float(RNG.uniform(1.0, 4.0))
    ch = RNG.randint(0, 256, (h, w), np.uint8)
    ours = A.clahe(ch, clip, (int(th), int(tw)))
    ref = cv2.createCLAHE(clipLimit=clip,
                          tileGridSize=(int(tw), int(th))).apply(ch)
    assert _frac_off(ours, ref, 2) < 0.08, (h, w, th, tw, clip)


def test_tiny_images_no_crash():
    """Degenerate sizes must not crash either backend (reflect101 n==1)."""
    for shape in [(1, 5), (5, 1), (2, 2), (1, 1)]:
        ch = RNG.randint(0, 256, shape, np.uint8)
        A.clahe(ch, 2.0, (8, 8))
        img3 = RNG.randint(0, 256, shape + (3,), np.uint8)
        A.gaussian_blur(img3, 3)
        A.resize_bilinear(img3, (4, 4))
        A.resize_nearest(ch, (4, 4))