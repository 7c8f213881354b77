from deeplab_tpu.crf.dense_crf import (CrfConfig, do_crf, mean_field,
                                       mean_field_batched, unary_from_labels)
