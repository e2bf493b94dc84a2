from realcamnet_tpu.parallel.mesh import (
    create_mesh,
    replicated,
    shard_batch,
)
