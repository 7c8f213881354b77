"""Multi-scale + flip test-time augmentation (Predictor tta_scales/tta_flip).

The reference inherits its mIoU claims from the upstream DeepLab eval
protocol (multi-scale + flip probability averaging; deeplabv3p.py:6); the
reference repo itself never implements it — this is a framework extension.
"""

import numpy as np
import jax
import pytest

from deeplab_tpu.crf import CrfConfig
from deeplab_tpu.models.seg_model import SegNet
from deeplab_tpu.parallel.mesh import get_mesh
from deeplab_tpu.predictor import Predictor

SZ = 32


def _net_and_weights(net_kind="original"):
    net = SegNet((SZ, SZ), 21, "mobilenetv2", net_kind)
    params, state = net.init(jax.random.key(0))
    return net, params, state


def test_tta_identity_scale_matches_base():
    """scales=(1.0,), no flip is exactly the argmax of apply()'s softmax.

    Compared against the probability path rather than predict_ids: at
    random init the head logits are O(1e-12), and the f32 softmax rounds
    all 21 classes to exactly 1/21 — argmax(softmax(logits)) then ties to
    index 0 while argmax(logits) sees the 1e-12 noise.  TTA averages
    probabilities, so the probability path is its identity contract."""
    import jax.numpy as jnp
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(0).rand(2, SZ, SZ, 3) * 255
    probs, _ = net.apply(params, state, jnp.asarray(imgs, jnp.float32),
                         compute_dtype=jnp.bfloat16)
    expected = np.asarray(probs).reshape(2, SZ, SZ, 21).argmax(-1)
    tta = Predictor(net, params, state, crf=None, tta_scales=(1.0,))
    np.testing.assert_array_equal(expected, tta(imgs))


def test_tta_flip_equivariance():
    """TTA over {identity, h-flip} is mirror-equivariant by construction:
    TTA(mirror(img)) == mirror(TTA(img)) regardless of network asymmetry."""
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(1).rand(2, SZ, SZ, 3) * 255
    tta = Predictor(net, params, state, crf=None, tta_flip=True)
    a = tta(imgs)
    b = tta(imgs[:, :, ::-1, :])
    np.testing.assert_array_equal(a, b[:, :, ::-1])


def test_tta_dedupes_snapped_scales():
    """Scales that snap to the same multiple-of-8 size run once: the
    ensemble must equal the deduped one (no double-weighted forward)."""
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(7).rand(2, SZ, SZ, 3) * 255
    a = Predictor(net, params, state, crf=None,
                  tta_scales=(0.97, 1.0, 0.5))(imgs)
    b = Predictor(net, params, state, crf=None,
                  tta_scales=(1.0, 0.5))(imgs)
    np.testing.assert_array_equal(a, b)


def test_tta_multiscale_with_crf():
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(2).rand(2, SZ, SZ, 3) * 255
    tta = Predictor(net, params, state,
                    crf=CrfConfig(sxy_bilateral=16.0, n_iters=2,
                                  backend="xla"),
                    tta_scales=(0.5, 1.0, 1.25), tta_flip=True)
    out = tta(imgs)
    assert out.shape == (2, SZ, SZ)
    assert out.dtype.kind == "i" and out.max() < 21


def test_tta_subpixel_head():
    net, params, state = _net_and_weights("subpixel")
    imgs = np.random.RandomState(3).rand(1, SZ, SZ, 3) * 255
    out = Predictor(net, params, state, crf=None,
                    tta_scales=(0.75, 1.0))(imgs)
    assert out.shape == (1, SZ, SZ) and out.max() < 21


def test_tta_sharded_matches_unsharded():
    net, params, state = _net_and_weights()
    imgs = np.random.RandomState(4).rand(8, SZ, SZ, 3) * 255
    kw = dict(crf=None, tta_scales=(0.5, 1.0), tta_flip=True)
    p1 = Predictor(net, params, state, **kw)
    p8 = Predictor(net, params, state, mesh=get_mesh(jax.devices()[:8]),
                   **kw)
    np.testing.assert_array_equal(p1(imgs), p8(imgs))


def test_calculate_iou_predict_fn_matches_default():
    """viz.calculate_iou(predict_fn=...) — a scale-1.0 TTA Predictor IS the
    default forward-argmax (both argmax the f32 softmax), so the whole
    confusion matrix must match."""
    from deeplab_tpu.viz import calculate_iou
    net, params, state = _net_and_weights()
    rng = np.random.RandomState(5)
    X = rng.rand(4, SZ, SZ, 3).astype(np.float32) * 255
    Y = rng.randint(0, 21, (4, SZ * SZ, 1)).astype(np.float32)

    class Gen:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return X[2 * i:2 * i + 2], Y[2 * i:2 * i + 2], {}

    import jax.numpy as jnp
    conf0, iou0, m0 = calculate_iou(net, params, state, Gen())
    tta = Predictor(net, params, state, crf=None, tta_scales=(1.0,),
                    compute_dtype=jnp.float32)
    conf1, iou1, m1 = calculate_iou(net, params, state, Gen(),
                                    predict_fn=tta)
    np.testing.assert_array_equal(conf0, conf1)
    assert m0 == m1


def test_cli_evaluate_tta_crf(tmp_path):
    """CLI evaluate --tta-scales/--eval-crf smoke: scores the serving
    pipeline instead of the raw forward."""
    from PIL import Image
    from deeplab_tpu import cli
    from deeplab_tpu.config import Config
    root = tmp_path / "voc"
    (root / "JPEGImages" / "train").mkdir(parents=True)
    (root / "SegmentationClassAug").mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        img = rng.randint(0, 255, (40, 40, 3), np.uint8)
        lab = rng.randint(0, 5, (40, 40), dtype=np.uint8)
        Image.fromarray(img).save(
            root / "JPEGImages" / "train" / f"im{i}.jpg", quality=95)
        Image.fromarray(lab, mode="L").save(
            root / "SegmentationClassAug" / f"im{i}.png")
    cfg = Config()
    cfg.model.image_size = (32, 32)
    cfg.model.n_classes = 5
    cfg.data.dataset = str(root)
    cfg.data.validation_split = 0.25
    cfg.train.batch_size = 2
    cfg.crf.sxy_bilateral = 16.0
    cfg.crf.n_iters = 1
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    cli.main(["evaluate", "--config", cfg_path,
              "--tta-scales", "0.75", "1.0", "--tta-flip", "--eval-crf"])


def test_tta_rejects_spatial_sharding():
    net, params, state = _net_and_weights()
    with pytest.raises(ValueError):
        Predictor(net, params, state, mesh=get_mesh(jax.devices()[:8],
                                                    data=4, space=2),
                  spatial=True, tta_scales=(0.5, 1.0))
