from realcamnet_tpu.entropy.models import (
    EntropyBottleneck,
    GaussianConditional,
    get_scale_table,
    ste_round,
)
