"""Cityscapes dataset adapter (BASELINE.json config 5: Xception OS=8
multi-chip fine-tuning on Cityscapes).

Layout: ``leftImg8bit/{split}/{city}/*_leftImg8bit.png`` images with
``gtFine/{split}/{city}/*_gtFine_labelIds.png`` labels.  Raw labelIds are
mapped to the 19 official train ids (ignored classes -> void).  The adapter
reuses the full SegmentationGenerator augmentation/weighting pipeline by
overriding path discovery and label reading.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from deeplab_tpu.data.generator import (SegmentationGenerator, _imread_bgr,
                                        _imread_gray, reference_split)

# official trainId mapping: labelId -> trainId (255 = ignore)
_ID_TO_TRAIN = np.full(256, 255, np.uint8)
for lid, tid in [(7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5), (19, 6),
                 (20, 7), (21, 8), (22, 9), (23, 10), (24, 11), (25, 12),
                 (26, 13), (27, 14), (28, 15), (31, 16), (32, 17), (33, 18)]:
    _ID_TO_TRAIN[lid] = tid

N_CLASSES = 19

CLASS_NAMES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic_light", "traffic_sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]


class CityscapesGenerator(SegmentationGenerator):
    """SegmentationGenerator over the Cityscapes layout with trainId labels.

    ``mode``: 'train' | 'validation' draw from the dataset's own train/val
    splits (no seeded subsplit needed — Cityscapes ships one), unless
    ``validation_split`` > 0, in which case the reference's seeded split of
    the train set is used (for parity with the VOC workflow).
    """

    def __init__(self, folder, mode="train", n_classes=N_CLASSES,
                 validation_split=0.0, seed=7, host_id=None,
                 num_hosts=None, **kw):
        split_dir = "train" if (mode in ("train", "validation")
                                and validation_split > 0) else \
            {"train": "train", "validation": "val", "test": "test"}[mode]
        images = sorted(glob.glob(os.path.join(
            folder, "leftImg8bit", split_dir, "*", "*_leftImg8bit.png")))
        labels = [p.replace(f"{os.sep}leftImg8bit{os.sep}",
                            f"{os.sep}gtFine{os.sep}")
                  .replace("_leftImg8bit.png", "_gtFine_labelIds.png")
                  for p in images]

        # bypass the parent's VOC path discovery: init with an empty folder
        # then install our lists (+ optional seeded subsplit + host shard).
        super().__init__(folder=os.path.join(folder, "__none__"), mode=mode,
                         n_classes=n_classes,
                         validation_split=validation_split, seed=seed, **kw)
        if validation_split > 0 and mode in ("train", "validation"):
            idx = reference_split(len(images), validation_split, seed, mode)
            images = [images[j] for j in idx]
            labels = [labels[j] for j in idx]
        from deeplab_tpu.data.generator import _resolve_host_shard
        host_id, num_hosts = _resolve_host_shard(host_id, num_hosts)
        if num_hosts > 1:
            images = images[host_id::num_hosts]
            labels = labels[host_id::num_hosts]
        self.image_path_list = images
        self.label_path_list = labels

    def _load_pair(self, image_path, label_path):
        image = _imread_bgr(image_path)
        label_ids = _imread_gray(label_path)
        label = _ID_TO_TRAIN[label_ids]
        # 255 (ignore) exceeds n_classes-1 and becomes void via the parent's
        # label hygiene clamp.
        return image, label
