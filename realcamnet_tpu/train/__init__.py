from realcamnet_tpu.train.schedules import make_schedule
