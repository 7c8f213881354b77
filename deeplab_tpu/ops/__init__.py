from deeplab_tpu.ops.padding import same_pads, manual_pads
from deeplab_tpu.ops.resize import resize_bilinear_tf1, resize_nearest_tf1
from deeplab_tpu.ops.pixel_shuffle import phase_shift
from deeplab_tpu.ops import conv, bn, init
