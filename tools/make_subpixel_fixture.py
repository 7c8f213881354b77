"""Generate weights/mobilenetv2_subpixel.h5 — a tf.keras-WRITTEN legacy-h5
weights file for the SegNet('subpixel') head (the reference ships this file
but it was stripped upstream: .MISSING_LARGE_BLOBS).  Kernel shapes are
input-size independent, so the fixture built at 64px loads at any size."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import h5py
import tensorflow as tf
from keras.src.legacy.saving import legacy_h5_format
from test_full_model_golden import _keras_trunk

tf.keras.utils.set_random_seed(42)
kmodel = _keras_trunk()
L = tf.keras.layers
n, r = 21, 8
y = L.Conv2D(n * r * r, 1, use_bias=True, name="subpixel_1")(kmodel.output)
head = tf.keras.Model(kmodel.input, y)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "weights", "mobilenetv2_subpixel.h5")
os.makedirs(os.path.dirname(out), exist_ok=True)
with h5py.File(out, "w") as f:
    legacy_h5_format.save_weights_to_hdf5_group(f, head)
print("wrote", out, os.path.getsize(out) // 1024, "KiB")
