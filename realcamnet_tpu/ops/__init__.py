from realcamnet_tpu.ops.blocks import (
    CALayer,
    ConvBlock,
    RCABlock,
    RCAGroup,
    ResBlock,
)
from realcamnet_tpu.ops.dwt import dwt_forward, dwt_inverse
from realcamnet_tpu.ops.pixel import (
    pad_to_multiple,
    pixel_shuffle,
    pixel_unshuffle,
    remove_padding_2x,
)
