from realcamnet_tpu.utils.profiling import cost_analysis, count_params
