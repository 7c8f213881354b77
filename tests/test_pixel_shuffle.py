"""Phase-shift channel ordering vs a direct port of the reference permutation
(subpixel.py:77-88) implemented in numpy, plus ICNR properties."""

import numpy as np
import jax
import jax.numpy as jnp

from deeplab_tpu.ops.pixel_shuffle import phase_shift, phase_shift_inverse
from deeplab_tpu.ops.init import icnr


def _reference_phase_shift(I, r):
    """Literal numpy transcription of the reference algorithm:
    reshape [f, r1, r2], permute (0,1,2,5,4,3), concat rows then cols."""
    bsize, a, b, c = I.shape
    X = I.reshape(bsize, a, b, c // (r * r), r, r)
    X = X.transpose(0, 1, 2, 5, 4, 3)               # (b, a, b', r2, r1, f)
    X = np.concatenate([X[:, i] for i in range(a)], axis=2)   # (b, b', a*r, r1, f)
    X = np.concatenate([X[:, i] for i in range(b)], axis=2)   # (b, a*r, b*r, f)
    return X


def test_phase_shift_matches_reference():
    rng = np.random.RandomState(0)
    for r in (2, 4, 8):
        x = rng.randn(2, 3, 5, 7 * r * r).astype(np.float32)
        ref = _reference_phase_shift(x, r)
        got = np.asarray(phase_shift(jnp.asarray(x), r))
        assert got.shape == (2, 3 * r, 5 * r, 7)
        np.testing.assert_array_equal(got, ref)


def test_phase_shift_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 2 * 9).astype(np.float32)
    y = phase_shift(jnp.asarray(x), 3)
    back = phase_shift_inverse(y, 3)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_icnr_subkernels_identical():
    # ICNR property (subpixel.py:13-39): each filter's r^2 output sub-kernels
    # start identical -> phase-shifted output has no checkerboard.
    r, f, cin = 4, 3, 8
    k = np.asarray(icnr(jax.random.key(0), (1, 1, cin, f * r * r), r))
    k = k.reshape(1, 1, cin, f, r * r)
    for i in range(1, r * r):
        np.testing.assert_array_equal(k[..., i], k[..., 0])


def test_icnr_output_constant_within_blocks():
    # applying a 1x1 ICNR conv then phase shift: every r x r output block is
    # constant (the checkerboard-free property, end to end).
    r, f, cin = 2, 2, 3
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, cin).astype(np.float32)
    k = np.asarray(icnr(jax.random.key(1), (1, 1, cin, f * r * r), r))
    y = x @ k[0, 0]                                # 1x1 conv
    out = np.asarray(phase_shift(jnp.asarray(y), r))[0]
    for bi in range(4):
        for bj in range(4):
            block = out[bi * r:(bi + 1) * r, bj * r:(bj + 1) * r]
            np.testing.assert_allclose(
                block, np.broadcast_to(block[0, 0], block.shape), rtol=1e-6)
