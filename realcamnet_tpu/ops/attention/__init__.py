from realcamnet_tpu.ops.attention.wmsa import WMSA, SwinTransformerBlock, SwinBlockPair
