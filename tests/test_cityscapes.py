"""Cityscapes adapter: layout discovery, trainId mapping, batch contract."""

import os

import numpy as np
import pytest

from deeplab_tpu.data.cityscapes import (CityscapesGenerator, N_CLASSES,
                                         _ID_TO_TRAIN)


@pytest.fixture(scope="module")
def city_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("cityscapes")
    rng = np.random.RandomState(0)
    for split, cities, n in [("train", ["aachen", "bochum"], 4),
                             ("val", ["frankfurt"], 3)]:
        for city in cities:
            (root / "leftImg8bit" / split / city).mkdir(parents=True)
            (root / "gtFine" / split / city).mkdir(parents=True)
            for i in range(n):
                stem = f"{city}_{i:06d}_000019"
                img = rng.randint(0, 255, (64, 128, 3), np.uint8)
                Image.fromarray(img).save(
                    root / "leftImg8bit" / split / city /
                    f"{stem}_leftImg8bit.png")
                # labelIds incl. ignored ids (0-6) and valid ones
                lab = rng.choice([0, 7, 8, 11, 26, 33], (64, 128)).astype(
                    np.uint8)
                Image.fromarray(lab, mode="L").save(
                    root / "gtFine" / split / city /
                    f"{stem}_gtFine_labelIds.png")
    return str(root)


def test_trainid_mapping():
    assert _ID_TO_TRAIN[7] == 0 and _ID_TO_TRAIN[26] == 13
    assert _ID_TO_TRAIN[33] == 18
    assert _ID_TO_TRAIN[0] == 255 and _ID_TO_TRAIN[6] == 255


def test_split_discovery(city_dir):
    tr = CityscapesGenerator(city_dir, mode="train", batch_size=2,
                             resize_shape=(64, 32), crop_shape=None,
                             do_ahisteq=False, brightness=0, rotation=0,
                             zoom=0, horizontal_flip=False)
    va = CityscapesGenerator(city_dir, mode="validation", batch_size=1,
                             resize_shape=(64, 32), crop_shape=None,
                             do_ahisteq=False, brightness=0, rotation=0,
                             zoom=0, horizontal_flip=False)
    assert len(tr.image_path_list) == 8   # 2 cities x 4
    assert len(va.image_path_list) == 3
    for ip, lp in zip(tr.image_path_list, tr.label_path_list):
        assert os.path.exists(ip) and os.path.exists(lp)


def test_batch_contract_and_void(city_dir):
    gen = CityscapesGenerator(city_dir, mode="train", batch_size=2,
                              resize_shape=(64, 32), crop_shape=None,
                              do_ahisteq=False, brightness=0, rotation=0,
                              zoom=0, horizontal_flip=False)
    X, Y, sw = gen[0]
    assert X.shape == (2, 32, 64, 3)
    assert Y.shape == (2, 32 * 64, 1)
    labels = np.unique(Y)
    # mapped trainIds in [0, 19) plus void == N_CLASSES
    assert labels.max() <= N_CLASSES
    assert (Y == N_CLASSES).any()  # ignored ids became void
    assert np.all(sw["pred_mask"][(Y[..., 0] == N_CLASSES)] == 0)


def test_seeded_subsplit(city_dir):
    tr = CityscapesGenerator(city_dir, mode="train", validation_split=0.25,
                             seed=7, batch_size=1, resize_shape=(32, 32),
                             crop_shape=None, do_ahisteq=False)
    va = CityscapesGenerator(city_dir, mode="validation",
                             validation_split=0.25, seed=7, batch_size=1,
                             resize_shape=(32, 32), crop_shape=None,
                             do_ahisteq=False)
    assert len(tr.image_path_list) == 6 and len(va.image_path_list) == 2
    assert set(tr.image_path_list).isdisjoint(va.image_path_list)
