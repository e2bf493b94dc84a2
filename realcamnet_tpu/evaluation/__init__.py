from realcamnet_tpu.evaluation.lpips import (
    init_lpips_params,
    load_torch_lpips,
    lpips,
)
from realcamnet_tpu.evaluation.metrics import (
    delta_e_cie76,
    delta_e_ciede2000,
    ms_ssim,
    psnr,
    ssim,
)
