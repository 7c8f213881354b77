"""Balanced-weight closed form vs sklearn (the reference's backend)."""

import numpy as np
import pytest

from deeplab_tpu.data.class_weights import (adaptive_pixel_weights,
                                            balanced_class_weights,
                                            fg_bg_pixel_weights)


def test_closed_form_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.utils import class_weight
    rng = np.random.RandomState(0)
    for _ in range(5):
        y = rng.randint(0, 6, 1000)
        u = np.unique(y)
        ref = class_weight.compute_class_weight("balanced", classes=u, y=y)
        ours = balanced_class_weights(y, u)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_adaptive_weights_semantics():
    n_classes = 4
    y = np.array([0, 0, 0, 1, 2, 4, 4])  # 4 == void
    sw = adaptive_pixel_weights(y, n_classes)
    # balanced over the 5 valid px with 3 classes: w_c = 5/(3*count_c)
    np.testing.assert_allclose(sw[:3], 5 / (3 * 3))
    np.testing.assert_allclose(sw[3], 5 / 3)
    np.testing.assert_allclose(sw[4], 5 / 3)
    np.testing.assert_allclose(sw[5:], 0.0)  # void -> 0 (utils.py:399)


def test_adaptive_weights_all_void():
    sw = adaptive_pixel_weights(np.full(10, 3), 3)
    np.testing.assert_allclose(sw, 0.0)


def test_fg_bg_weights_semantics():
    n = 3
    y = np.array([0, 0, 1, 2, 3])  # bg, bg, fg, fg, void
    sw = fg_bg_pixel_weights(y, n)
    # valid px: [0,0,1,1]; balanced: w0 = 4/(2*2) = 1, w1 = 1
    np.testing.assert_allclose(sw, [1, 1, 1, 1, 0])
    y2 = np.array([0, 0, 0, 1])  # 3 bg, 1 fg
    sw2 = fg_bg_pixel_weights(y2, n)
    np.testing.assert_allclose(sw2, [4 / 6, 4 / 6, 4 / 6, 2.0])


def test_fg_bg_weights_single_class_patches():
    n = 3
    # all background -> fg weight patched to 0 (utils.py:373-377)
    sw = fg_bg_pixel_weights(np.zeros(5, int), n)
    np.testing.assert_allclose(sw, 1.0)
    # all void -> both weights 0
    sw2 = fg_bg_pixel_weights(np.full(5, n), n)
    np.testing.assert_allclose(sw2, 0.0)
