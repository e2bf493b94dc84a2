from realcamnet_tpu.evaluation.metrics import (
    delta_e_cie76,
    delta_e_ciede2000,
    ms_ssim,
    psnr,
    ssim,
)
