from realcamnet_tpu.data.dataset import (
    PairedRawDataset,
    coord_map,
    prefetch_to_device,
    synthetic_batch,
)
