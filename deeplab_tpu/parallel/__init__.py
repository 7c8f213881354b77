from deeplab_tpu.parallel.mesh import (get_mesh, data_sharding,
                                       replicated_sharding, shard_batch,
                                       get_available_devices)
