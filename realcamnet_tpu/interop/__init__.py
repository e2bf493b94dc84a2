from realcamnet_tpu.interop.torch_import import (  # noqa: F401
    convert_liteisp_state_dict,
    load_liteisp_torch_checkpoint,
)
