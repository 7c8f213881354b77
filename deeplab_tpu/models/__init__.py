from deeplab_tpu.models.deeplabv3p import Deeplabv3, deeplabv3_forward
from deeplab_tpu.models.seg_model import SegModel
