from deeplab_tpu.train.trainer import Trainer
from deeplab_tpu.train.callbacks import (ModelCheckpoint, ReduceLROnPlateau,
                                         EarlyStopping)
from deeplab_tpu.train.optimizer import make_optimizer, freeze_set
