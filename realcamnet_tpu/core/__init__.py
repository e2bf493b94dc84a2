from realcamnet_tpu.core.dtypes import DTypePolicy, default_policy
