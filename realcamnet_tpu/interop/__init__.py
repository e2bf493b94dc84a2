from realcamnet_tpu.interop.torch_import import (  # noqa: F401
    convert_groupmixformer_state_dict,
    convert_ispnet_gfm_state_dict,
    convert_ispunet_state_dict,
    convert_liteisp_state_dict,
    convert_mwisp_state_dict,
    convert_raw2bit_state_dict,
    convert_raw2bit_variant_state_dict,
    convert_tcm_state_dict,
    load_liteisp_torch_checkpoint,
)
