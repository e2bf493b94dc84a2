"""realcamnet_tpu — TPU-native end-to-end camera imaging engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of RealCamNet
(ACMMM 2024, reference: kepengxu/RealCamNet): a learned RAW->sRGB ISP
(LiteISP conv/pixel-shuffle backbone, GroupMix/GMA and Swin window attention,
global/local color-prior modulation, coordinate-aware lens-shading
rectification) joined to a TCM-style transformer-CNN compression head with a
channel-autoregressive (ChARM) entropy model and a C++ rANS bitstream coder.

Layout convention: **NHWC** everywhere (TPU-native; channels ride the 128-wide
lane dimension). The reference is NCHW torch; all shape contracts in
docstrings cite the reference as (N,C,H,W) but our arrays are (N,H,W,C).
"""

__version__ = "0.1.0"
