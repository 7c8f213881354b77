"""Predictor.predict_files: streamed file serving (decode/compute overlap)."""

import numpy as np
import jax
import pytest

from deeplab_tpu.data.augment import resize_bilinear
from deeplab_tpu.data.generator import _imread_bgr
from deeplab_tpu.models.seg_model import SegNet
from deeplab_tpu.predictor import Predictor

SZ = 32


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([(SZ, SZ), (SZ, SZ), (48, 40), (SZ, SZ),
                              (24, 56)]):
        arr = rng.randint(0, 255, size + (3,), dtype=np.uint8)
        p = d / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _expected_batch(paths):
    return np.stack([resize_bilinear(_imread_bgr(p), (SZ, SZ))
                     for p in paths]).astype(np.float32)


def test_predict_files_matches_call(image_files):
    net = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    pred = Predictor(net, params, state, crf=None)
    got = dict(pred.predict_files(image_files, batch_size=2, workers=2))
    assert list(got) == image_files  # input order preserved
    want = pred(_expected_batch(image_files))
    for i, p in enumerate(image_files):
        np.testing.assert_array_equal(got[p], want[i])


def test_predict_files_workers_zero(image_files):
    """workers derived from cpu-count arithmetic can bottom out at 0;
    predict_files clamps instead of crashing the thread pool."""
    net = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    pred = Predictor(net, params, state, crf=None)
    got = dict(pred.predict_files(image_files[:2], batch_size=2, workers=0))
    assert list(got) == image_files[:2]


def test_predict_files_return_raw_and_ragged(image_files):
    net = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    from deeplab_tpu.crf import CrfConfig
    pred = Predictor(net, params, state, return_raw=True,
                     crf=CrfConfig(sxy_bilateral=16.0, n_iters=1,
                                   backend="xla"))
    # batch_size larger than the file count: one padded batch
    out = list(pred.predict_files(image_files, batch_size=8))
    assert len(out) == len(image_files)
    raw_b, ref_b = pred(_expected_batch(image_files))
    for i, (p, (raw, ref)) in enumerate(out):
        np.testing.assert_array_equal(raw, raw_b[i])
        np.testing.assert_array_equal(ref, ref_b[i])


def test_predict_files_sharded(image_files):
    from deeplab_tpu.parallel.mesh import get_mesh
    net = SegNet((SZ, SZ), 21, "mobilenetv2", "original")
    params, state = net.init(jax.random.key(0))
    pred = Predictor(net, params, state, crf=None,
                     mesh=get_mesh(jax.devices()[:8]))
    # batch_size 3 does not divide the 8-device mesh: dispatch pads it
    got = dict(pred.predict_files(image_files, batch_size=3))
    want = pred(_expected_batch(image_files))
    for i, p in enumerate(image_files):
        np.testing.assert_array_equal(got[p], want[i])
