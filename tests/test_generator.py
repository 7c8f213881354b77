"""SegmentationGenerator: seeded split parity, batch contract, label hygiene."""

import os

import numpy as np
import pytest

from deeplab_tpu.data.generator import (SegmentationGenerator, Prefetcher,
                                        reference_split, _random_crop)


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    """Synthetic SBD-augmented VOC layout (utils.py:265-266)."""
    from PIL import Image
    root = tmp_path_factory.mktemp("voc")
    img_dir = root / "JPEGImages" / "train"
    lab_dir = root / "SegmentationClassAug"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(12):
        # smooth image so JPEG keeps channels distinguishable: B>>R
        img = np.zeros((40, 50, 3), np.uint8)
        img[..., 0] = 60   # R (PIL saves RGB)
        img[..., 1] = 120  # G
        img[..., 2] = 200  # B -> becomes channel 0 after BGR swap on read
        Image.fromarray(img).save(img_dir / f"im_{i:03d}.jpg", quality=95)
        lab = rng.randint(0, 5, (40, 50), np.uint8)
        lab[0, 0] = 255  # a void-ish id > n_classes-1
        Image.fromarray(lab, mode="L").save(lab_dir / f"im_{i:03d}.png")
    return str(root)


def test_reference_split_exact():
    """Must reproduce utils.py:268-276 byte-for-byte."""
    n, split, seed = 100, 0.2, 7
    np.random.seed(seed)
    n_sel = round(n * split)
    x = np.random.permutation(n)[:n_sel]
    expect_valid = x.copy()
    expect_train = np.setxor1d(x, np.arange(n))
    np.testing.assert_array_equal(
        reference_split(n, split, seed, "validation"), expect_valid)
    np.testing.assert_array_equal(
        reference_split(n, split, seed, "train"), expect_train)


def test_train_valid_disjoint_and_cover():
    tr = set(reference_split(50, 0.3, 7, "train"))
    va = set(reference_split(50, 0.3, 7, "validation"))
    assert tr.isdisjoint(va)
    assert tr | va == set(range(50))


def test_generator_batch_contract(voc_dir):
    gen = SegmentationGenerator(folder=voc_dir, mode="train", n_classes=5,
                                batch_size=2, resize_shape=(32, 24),
                                crop_shape=None, validation_split=0.25,
                                seed=7, do_ahisteq=False, brightness=0,
                                rotation=0, zoom=0, horizontal_flip=False)
    assert len(gen) == 9 // 2  # 12 images - 3 validation = 9 train
    X, Y, sw = gen[0]
    assert X.shape == (2, 24, 32, 3) and X.dtype == np.float32
    assert Y.shape == (2, 24 * 32, 1)
    assert sw["pred_mask"].shape == (2, 24 * 32)
    assert 0 <= X.min() and X.max() <= 255  # raw pixels, normalization in-model
    # labels clamped to [0, n_classes]
    assert Y.min() >= 0 and Y.max() <= 5
    # void pixels have zero weight
    void = (Y[..., 0] == 5)
    assert np.all(sw["pred_mask"][void] == 0)


def test_generator_bgr_contract(voc_dir):
    gen = SegmentationGenerator(folder=voc_dir, mode="train", n_classes=5,
                                batch_size=1, resize_shape=(32, 24),
                                crop_shape=None, do_ahisteq=False,
                                brightness=0, rotation=0, zoom=0,
                                horizontal_flip=False)
    X, _, _ = gen[0]
    # source images had blue=200 (stored channel 0 in BGR)
    assert abs(X[..., 0].mean() - 200) < 15  # jpeg noise tolerance


def test_generator_validation_mode_smaller(voc_dir):
    tr = SegmentationGenerator(folder=voc_dir, mode="train", batch_size=1,
                               resize_shape=(16, 16), crop_shape=None,
                               validation_split=0.25, seed=7,
                               do_ahisteq=False)
    va = SegmentationGenerator(folder=voc_dir, mode="validation", batch_size=1,
                               resize_shape=(16, 16), crop_shape=None,
                               validation_split=0.25, seed=7,
                               do_ahisteq=False)
    assert len(tr) == 9 and len(va) == 3
    assert set(tr.image_path_list).isdisjoint(va.image_path_list)


def test_generator_host_sharding(voc_dir):
    shards = [SegmentationGenerator(folder=voc_dir, mode="train", batch_size=1,
                                    resize_shape=(16, 16), crop_shape=None,
                                    validation_split=0.25, seed=7,
                                    do_ahisteq=False, host_id=h, num_hosts=2)
              for h in range(2)]
    all_paths = sum((s.image_path_list for s in shards), [])
    assert len(all_paths) == 9
    assert len(set(all_paths)) == 9


def test_generator_test_mode(voc_dir):
    """mode='test' pulls the first 100 of JPEGImages/test (utils.py:278-279)."""
    import shutil
    test_dir = os.path.join(voc_dir, "JPEGImages", "test")
    os.makedirs(test_dir, exist_ok=True)
    src_dir = os.path.join(voc_dir, "JPEGImages", "train")
    for i, f in enumerate(sorted(os.listdir(src_dir))[:5]):
        shutil.copy(os.path.join(src_dir, f), os.path.join(test_dir, f))
    gen = SegmentationGenerator(folder=voc_dir, mode="test", batch_size=1,
                                resize_shape=(16, 16), crop_shape=None,
                                do_ahisteq=False)
    assert len(gen.image_path_list) == 5
    assert all("JPEGImages/test" in p or "JPEGImages\\test" in p
               for p in gen.image_path_list)


def test_array_batcher():
    """In-memory training path (SegModel.train, utils.py:243-247)."""
    from deeplab_tpu.data.generator import ArrayBatcher
    rng = np.random.RandomState(0)
    X = rng.rand(6, 8, 8, 3).astype(np.float32)
    Y = rng.randint(0, 4, (6, 64)).astype(np.float32)
    b = ArrayBatcher(X, Y, batch_size=2, n_classes=4)
    assert len(b) == 3
    xb, yb, swd = b[1]
    assert xb.shape == (2, 8, 8, 3) and yb.shape == (2, 64, 1)
    assert swd["pred_mask"].shape == (2, 64)
    assert np.all(swd["pred_mask"] >= 0)


def test_random_crop_semantics():
    import random
    random.seed(0)
    img = np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3)
    lab = np.arange(40 * 50, dtype=np.uint8).reshape(40, 50)
    ci, cl = _random_crop(img, lab, (20, 10))   # (W, H)
    assert ci.shape == (10, 20, 3) and cl.shape == (10, 20)
    # crop larger than image -> resize path
    ci2, cl2 = _random_crop(img, lab, (60, 60))
    assert ci2.shape == (60, 60, 3) and cl2.shape == (60, 60)


def test_prefetcher_batches_are_independent(voc_dir):
    """Regression: queued batches must be copies, not the generator's shared
    preallocated buffers (which the producer keeps overwriting)."""
    gen = SegmentationGenerator(folder=voc_dir, mode="train", batch_size=1,
                                resize_shape=(16, 16), crop_shape=None,
                                validation_split=0.25, seed=7,
                                do_ahisteq=False, brightness=0, rotation=0,
                                zoom=0, horizontal_flip=False)
    direct = [np.copy(gen[i][0]) for i in range(len(gen))]
    import time
    batches = []
    for X, Y, _ in Prefetcher(gen, max_queue_size=len(gen)):
        time.sleep(0.01)  # let the producer run ahead
        batches.append(X)
    assert len(batches) == len(gen)
    for got, want in zip(batches, direct):
        np.testing.assert_array_equal(got, want)
    # and they must be distinct arrays, not views of one buffer
    assert not any(b1 is b2 for i, b1 in enumerate(batches)
                   for b2 in batches[i + 1:])


def test_prefetcher_early_close_no_hang(voc_dir):
    gen = SegmentationGenerator(folder=voc_dir, mode="train", batch_size=1,
                                resize_shape=(16, 16), crop_shape=None,
                                validation_split=0.25, seed=7,
                                do_ahisteq=False)
    pf = Prefetcher(gen, max_queue_size=1)
    it = iter(pf)
    next(it)          # start the worker, consume one
    pf.close()        # worker may be blocked in put(); must exit
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()
    # a fresh iteration works (fresh queue, no stale sentinel)
    batches = list(pf)
    assert len(batches) == len(gen)


def test_prefetcher_yields_all(voc_dir):
    gen = SegmentationGenerator(folder=voc_dir, mode="train", batch_size=2,
                                resize_shape=(16, 16), crop_shape=None,
                                validation_split=0.25, seed=7,
                                do_ahisteq=False, brightness=0, rotation=0,
                                zoom=0, horizontal_flip=False)
    batches = list(Prefetcher(gen, max_queue_size=2))
    assert len(batches) == len(gen)
    X, Y, sw = batches[0]
    assert X.shape[0] == 2


def test_augmentations_run(voc_dir):
    """Full augmentation path executes (blur, flips, brightness, rot+zoom,
    CLAHE) and keeps shapes/label ranges valid."""
    gen = SegmentationGenerator(folder=voc_dir, mode="train", n_classes=5,
                                batch_size=2, resize_shape=(32, 24),
                                crop_shape=None, validation_split=0.25,
                                seed=7, do_ahisteq=True, blur=5,
                                brightness=0.3, rotation=5.0, zoom=0.1,
                                horizontal_flip=True, vertical_flip=True)
    X, Y, sw = gen[1]
    assert X.shape == (2, 24, 32, 3)
    assert Y.max() <= 5
    gen.on_epoch_end()  # shuffle works
    X2, _, _ = gen[0]
    assert X2.shape == (2, 24, 32, 3)
