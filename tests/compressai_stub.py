"""Functional torch stand-ins for the CompressAI pieces the reference
imports, with CompressAI's layer semantics and state-dict key names.

Purpose: let the reference `models/tcm.py` / `models/raw2bit.py` run as a
*transform-path* oracle without CompressAI installed. The entropy models are
deliberately minimal: EntropyBottleneck returns dummy likelihoods (the
reference forward only uses its `_get_medians()` for the STE path);
GaussianConditional implements the real erfc likelihood with the 0.11 scale
floor (`tcm.py:572-590` re-derives the same math) so y-likelihood/bpp parity
can be checked.

Layer semantics follow CompressAI (github.com/InterDigitalInc/CompressAI,
compressai/layers/layers.py + compressai/layers/gdn.py): these definitions
are public and fixed; our JAX library mirrors them in
realcamnet_tpu/ops/codec_layers.py.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def conv3x3(in_ch, out_ch, stride=1):
    return nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)


def conv1x1(in_ch, out_ch, stride=1):
    return nn.Conv2d(in_ch, out_ch, 1, stride=stride)


def subpel_conv3x3(in_ch, out_ch, r=1):
    return nn.Sequential(nn.Conv2d(in_ch, out_ch * r * r, 3, padding=1),
                         nn.PixelShuffle(r))


def conv(in_channels, out_channels, kernel_size=5, stride=2):
    return nn.Conv2d(in_channels, out_channels, kernel_size, stride=stride,
                     padding=kernel_size // 2)


def deconv(in_channels, out_channels, kernel_size=5, stride=2):
    return nn.ConvTranspose2d(in_channels, out_channels, kernel_size,
                              stride=stride, output_padding=stride - 1,
                              padding=kernel_size // 2)


class _LowerBound(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, bound):
        ctx.save_for_backward(x, bound)
        return torch.max(x, bound)

    @staticmethod
    def backward(ctx, g):
        x, bound = ctx.saved_tensors
        pass_through = (x >= bound) | (g < 0)
        return pass_through.type(g.dtype) * g, None


class NonNegativeParametrizer(nn.Module):
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        super().__init__()
        self.minimum = float(minimum)
        pedestal = reparam_offset ** 2
        self.register_buffer("pedestal", torch.tensor([pedestal]))
        self.bound = torch.tensor([(self.minimum + pedestal) ** 0.5])

    def init(self, x):
        return torch.sqrt(torch.max(x + self.pedestal, self.pedestal))

    def forward(self, x):
        out = _LowerBound.apply(x, self.bound.to(x.dtype))
        return out ** 2 - self.pedestal


class GDN(nn.Module):
    def __init__(self, in_channels, inverse=False, beta_min=1e-6,
                 gamma_init=0.1):
        super().__init__()
        self.inverse = inverse
        self.beta_reparam = NonNegativeParametrizer(minimum=beta_min)
        beta = self.beta_reparam.init(torch.ones(in_channels))
        self.beta = nn.Parameter(beta)
        self.gamma_reparam = NonNegativeParametrizer()
        gamma = self.gamma_reparam.init(gamma_init * torch.eye(in_channels))
        self.gamma = nn.Parameter(gamma)

    def forward(self, x):
        _, C, _, _ = x.size()
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma).reshape(C, C, 1, 1)
        norm = F.conv2d(x ** 2, gamma, beta)
        norm = torch.sqrt(norm)
        return x * norm if self.inverse else x / norm


class ResidualBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = conv3x3(in_ch, out_ch)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv2 = conv3x3(out_ch, out_ch)
        self.skip = conv1x1(in_ch, out_ch) if in_ch != out_ch else None

    def forward(self, x):
        identity = x
        out = self.conv1(x)
        out = self.leaky_relu(out)
        out = self.conv2(out)
        out = self.leaky_relu(out)
        if self.skip is not None:
            identity = self.skip(x)
        return out + identity


class ResidualBlockWithStride(nn.Module):
    def __init__(self, in_ch, out_ch, stride=2):
        super().__init__()
        self.conv1 = conv3x3(in_ch, out_ch, stride=stride)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv2 = conv3x3(out_ch, out_ch)
        self.gdn = GDN(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.skip = conv1x1(in_ch, out_ch, stride=stride)
        else:
            self.skip = None

    def forward(self, x):
        identity = x
        out = self.conv1(x)
        out = self.leaky_relu(out)
        out = self.conv2(out)
        out = self.gdn(out)
        if self.skip is not None:
            identity = self.skip(x)
        return out + identity


class ResidualBlockUpsample(nn.Module):
    def __init__(self, in_ch, out_ch, upsample=2):
        super().__init__()
        self.subpel_conv = subpel_conv3x3(in_ch, out_ch, upsample)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv = conv3x3(out_ch, out_ch)
        self.igdn = GDN(out_ch, inverse=True)
        self.upsample = subpel_conv3x3(in_ch, out_ch, upsample)

    def forward(self, x):
        identity = x
        out = self.subpel_conv(x)
        out = self.leaky_relu(out)
        out = self.conv(out)
        out = self.igdn(out)
        identity = self.upsample(x)
        return out + identity


class AttentionBlock(nn.Module):
    def __init__(self, N):
        super().__init__()

        class ResidualUnit(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Sequential(
                    conv1x1(N, N // 2), nn.ReLU(inplace=True),
                    conv3x3(N // 2, N // 2), nn.ReLU(inplace=True),
                    conv1x1(N // 2, N),
                )
                self.relu = nn.ReLU(inplace=True)

            def forward(self, x):
                identity = x
                out = self.conv(x)
                out += identity
                out = self.relu(out)
                return out

        self.conv_a = nn.Sequential(ResidualUnit(), ResidualUnit(), ResidualUnit())
        self.conv_b = nn.Sequential(ResidualUnit(), ResidualUnit(), ResidualUnit(),
                                    conv1x1(N, N))

    def forward(self, x):
        identity = x
        a = self.conv_a(x)
        b = self.conv_b(x)
        out = a * torch.sigmoid(b)
        out += identity
        return out


class MaskedConv2d(nn.Conv2d):
    def __init__(self, *args, mask_type="A", **kwargs):
        super().__init__(*args, **kwargs)
        self.register_buffer("mask", torch.ones_like(self.weight.data))
        _, _, h, w = self.mask.size()
        self.mask[:, :, h // 2, w // 2 + (mask_type == "B"):] = 0
        self.mask[:, :, h // 2 + 1:] = 0

    def forward(self, x):
        self.weight.data *= self.mask
        return super().forward(x)


class EntropyBottleneck(nn.Module):
    """Minimal: quantiles parameter + `_get_medians`; forward returns the
    input and dummy likelihoods (the reference forward computes z_hat itself
    via ste_round and only reads medians)."""

    def __init__(self, channels, init_scale=10.0, filters=(3, 3, 3, 3)):
        super().__init__()
        self.channels = channels
        init = torch.tensor([-init_scale, 0.0, init_scale])
        self.quantiles = nn.Parameter(init.repeat(channels, 1, 1))

    def _get_medians(self):
        return self.quantiles[:, :, 1:2].detach().reshape(1, -1, 1, 1)

    def forward(self, x):
        medians = self._get_medians().to(x.dtype)
        x_hat = torch.round(x - medians) + medians
        return x_hat, torch.ones_like(x) * 0.5


class GaussianConditional(nn.Module):
    """Real erfc likelihood with the CompressAI 0.11 scale lower bound."""

    def __init__(self, scale_table=None, scale_bound=0.11,
                 likelihood_bound=1e-9):
        super().__init__()
        self.scale_bound = scale_bound
        self.likelihood_bound = likelihood_bound

    @staticmethod
    def _standardized_cumulative(x):
        half, const = 0.5, -(2 ** -0.5)
        return half * torch.erfc(const * x)

    def forward(self, values, scales, means=None):
        if means is not None:
            values_c = values - means
        else:
            values_c = values
        outputs = torch.round(values_c)
        if means is not None:
            y_hat = outputs + means
        else:
            y_hat = outputs
        scales = torch.clamp(scales, min=self.scale_bound)
        # CompressAI computes the likelihood at the QUANTIZED residual
        # (eval-mode 'dequantize' path of GaussianConditional.forward).
        v = torch.abs(outputs)
        upper = self._standardized_cumulative((0.5 - v) / scales)
        lower = self._standardized_cumulative((-0.5 - v) / scales)
        likelihood = torch.clamp(upper - lower, min=self.likelihood_bound)
        return y_hat, likelihood


class CompressionModel(nn.Module):
    def __init__(self, entropy_bottleneck_channels=None, init_weights=None):
        super().__init__()

    def aux_loss(self):
        return torch.tensor(0.0)

    def update(self, force=False):
        return False


def update_registered_buffers(module, module_name, buffer_names, state_dict,
                              policy="resize_if_empty", dtype=torch.int):
    return None
