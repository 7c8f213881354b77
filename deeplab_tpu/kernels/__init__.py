from deeplab_tpu.kernels.crf_grid import (pallas_available, splat_cells,
                                          slice_cells)
