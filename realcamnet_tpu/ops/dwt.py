"""2x2 Haar DWT / inverse DWT, TPU-native.

The reference implements these as frozen grouped stride-2 convolutions
(`networks.py:224-249`). On TPU a grouped 2x2 conv maps poorly to the MXU;
instead we do space-to-depth + a fixed orthogonal 4x4 Haar mix, which XLA
lowers to reshape/transpose + a tiny matmul fused with neighbors.

Channel layout matches the reference's grouped conv: for input channel c the
four subbands occupy output channels [4c+0..4c+3] = (LL, LH, HL, HH) with
filters (conv=cross-correlation):
  LL = .5(a+b+c+d), LH = .5(a+b-c-d), HL = .5(a-b+c-d), HH = .5(a-b-c+d)
for a 2x2 patch [[a,b],[c,d]]. The Haar matrix is orthogonal so the inverse
is its transpose and dwt_inverse(dwt_forward(x)) == x exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Rows: subband; cols: flattened 2x2 patch (a,b,c,d) row-major.
_HAAR = np.array(
    [
        [0.5, 0.5, 0.5, 0.5],    # LL
        [0.5, 0.5, -0.5, -0.5],  # LH
        [0.5, -0.5, 0.5, -0.5],  # HL
        [0.5, -0.5, -0.5, 0.5],  # HH
    ],
    dtype=np.float32,
)


def dwt_forward(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2,W/2,4C); H and W must be even."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"DWT needs even spatial dims, got {h}x{w}"
    # (B, H/2, 2, W/2, 2, C) -> (B, H/2, W/2, C, 2, 2) -> (..., C, 4)
    patches = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 5, 2, 4)
    patches = patches.reshape(b, h // 2, w // 2, c, 4)
    haar = jnp.asarray(_HAAR, x.dtype)
    sub = jnp.einsum("bhwcp,kp->bhwck", patches, haar)
    return sub.reshape(b, h // 2, w // 2, c * 4)


def dwt_inverse(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,4C) -> (B,2H,2W,C)."""
    b, h, w, c4 = x.shape
    assert c4 % 4 == 0
    c = c4 // 4
    sub = x.reshape(b, h, w, c, 4)
    haar = jnp.asarray(_HAAR, x.dtype)
    patches = jnp.einsum("bhwck,kp->bhwcp", sub, haar)  # orthogonal: inv = H^T
    patches = patches.reshape(b, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return patches.reshape(b, h * 2, w * 2, c)


def dwt_forward_bhcw(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,C,W) -> (B,H/2,4C,W/2) in the channel-sublane BHCW layout
    (ops/pallas_conv.py); same subband/channel order as `dwt_forward`."""
    b, h, c, w = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"DWT needs even spatial dims, got {h}x{w}"
    p = x.reshape(b, h // 2, 2, c, w // 2, 2).transpose(0, 1, 3, 2, 5, 4)
    p = p.reshape(b, h // 2, c, 4, w // 2)
    haar = jnp.asarray(_HAAR, x.dtype)
    sub = jnp.einsum("bhcpw,kp->bhckw", p, haar)
    return sub.reshape(b, h // 2, c * 4, w // 2)


def dwt_inverse_bhcw(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,4C,W) -> (B,2H,C,2W), inverse of `dwt_forward_bhcw`."""
    b, h, c4, w = x.shape
    assert c4 % 4 == 0
    c = c4 // 4
    sub = x.reshape(b, h, c, 4, w)
    haar = jnp.asarray(_HAAR, x.dtype)
    p = jnp.einsum("bhckw,kp->bhcpw", sub, haar)
    p = p.reshape(b, h, c, 2, 2, w).transpose(0, 1, 3, 2, 5, 4)
    return p.reshape(b, h * 2, c, w * 2)
