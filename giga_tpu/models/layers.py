"""Shared flax layers + torch-compatible initializers.

Initializers replicate torch defaults so that training from scratch has the
same dynamics as the reference:
  * torch Linear/ConvNd default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for weights, U(+-1/sqrt(fan_in)) for biases.
  * The reference U-Net re-initializes its Conv2d weights with xavier_normal
    and zero biases (ConvONets/encoder/unet.py:213-217); its ConvTranspose2d
    layers keep torch defaults (weight_init checks isinstance(m, nn.Conv2d),
    which ConvTranspose2d is not).
  * ResnetBlockFC zero-initializes fc_1's weight (ConvONets/layers.py:37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# U(+-sqrt(1/fan_in)) — torch's kaiming_uniform(a=sqrt(5)) weight default
torch_weight_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)

xavier_normal_init = jax.nn.initializers.glorot_normal()


def torch_bias_init(fan_in: int):
    """torch's bias default: U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch-default initialization."""

    features: int
    use_bias: bool = True
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_weight_init,
            (in_features, self.features),
        )
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_features), (self.features,))
            y = y + bias
        return y


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block (reference: ConvONets/layers.py:6-47).

    y = shortcut(x) + fc_1(relu(fc_0(relu(x)))), fc_1 weight zero-initialized.
    Shortcut is identity when sizes match (the only case GIGA uses).
    """

    size_out: int | None = None
    size_h: int | None = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)

        net = TorchDense(size_h, name="fc_0")(jax.nn.relu(x))
        dx = TorchDense(size_out, name="fc_1", kernel_init=jax.nn.initializers.zeros)(
            jax.nn.relu(net)
        )
        if size_in == size_out:
            x_s = x
        else:
            x_s = TorchDense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


def torch_conv(features: int, kernel_size, strides=1, padding=None, name=None, kernel_init=None,
               bias_init=None, in_features=None):
    """nn.Conv configured with torch-style explicit padding & init.

    ``padding`` defaults to k//2 per dim (torch's common 'same-ish' choice,
    exact for odd kernels at stride 1 and matching torch alignment at
    stride 2).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,)
    if padding is None:
        padding = [(k // 2, k // 2) for k in kernel_size]
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding=padding,
        kernel_init=kernel_init or torch_weight_init,
        bias_init=bias_init if bias_init is not None else jax.nn.initializers.zeros,
        name=name,
    )


class TorchConv(nn.Module):
    """Conv wrapper adding torch-default bias init (needs runtime fan_in)."""

    features: int
    kernel_size: tuple
    strides: int = 1
    padding: object = None
    kernel_init: object = None
    xavier: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        ksize = self.kernel_size
        if isinstance(ksize, int):
            ksize = (ksize,) * (x.ndim - 2)
        padding = self.padding
        if padding is None:
            padding = [(k // 2, k // 2) for k in ksize]
        fan_in = in_features
        for k in ksize:
            fan_in *= k
        if self.xavier:
            kinit, binit = xavier_normal_init, jax.nn.initializers.zeros
        else:
            kinit = self.kernel_init or torch_weight_init
            binit = torch_bias_init(fan_in)
        conv = nn.Conv(
            features=self.features,
            kernel_size=ksize,
            strides=self.strides,
            padding=padding,
            kernel_init=kinit,
            bias_init=binit,
            use_bias=self.use_bias,
            name="conv",
        )
        return conv(x)


class ConvTranspose2x2(nn.Module):
    """Exact torch ConvTranspose2d(k=2, s=2) as reshape + einsum.

    Each input pixel emits a 2x2 output block:
        out[2i+di, 2j+dj, o] = sum_c in[i, j, c] * W[c, di, dj, o] + b[o]
    This is a single MXU matmul instead of a transposed-convolution lowering.
    Kernel layout (C_in, 2, 2, C_out) maps from torch's (I, O, kH, kW) by
    transpose(0, 2, 3, 1).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # torch computes fan_in on the (I, O, kH, kW) layout as O*kH*kW
        fan_in = self.features * 2 * 2
        kernel = self.param("kernel", torch_bias_init(fan_in), (C, 2, 2, self.features))
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        y = jnp.einsum("bhwc,cdko->bhdwko", x, kernel)
        y = y.reshape(B, 2 * H, 2 * W, self.features)
        return y + bias

class ZBandedConvStem(nn.Module):
    """Conv3d(1 -> C, k, SAME) with the z axis folded into channels.

    A Cin=1 conv3d gives the MXU a contraction depth of k^3 = 27 (of 128
    lanes) — profiling shows the 40^3 stem costs ~0.56 ms of the 0.81 ms
    fp32 encode. Treating the (B, X, Y, Z) volume as a 2D image with Z
    channels and convolving with a z-banded (k, k, Z, Z*C) kernel raises the
    contraction depth to k^2*Z (=360) for k^2*Z/k^3 = Z/k times the (cheap)
    FLOPs. The off-band kernel entries are exact zeros (also reproducing the
    conv3d's zero padding along z), so the two forms compute the same
    nonzero partial products and agree to fp rounding — the reduction order
    differs between lowerings, so expect ~1e-6 reassociation noise, not
    bit-equality (tests pin 2e-6).

    Parameter tree is identical to ``TorchConv(name=...)`` — a "conv"
    submodule holding kernel (k, k, k, 1, C) + bias — so checkpoints and the
    torch converter are unaffected. Off TPU the same params run the plain
    conv3d (the banded form only pays off on a systolic array).
    """

    features: int
    kernel_size: int = 3
    use_zbanded: bool | None = None  # None = auto (banded on TPU only)

    class _Params(nn.Module):
        shape: tuple
        fan_in: int

        @nn.compact
        def __call__(self):
            kernel = self.param("kernel", torch_weight_init, self.shape)
            bias = self.param("bias", torch_bias_init(self.fan_in),
                              (self.shape[-1],))
            return kernel, bias

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 1, "stem expects a single input channel"
        k, C = self.kernel_size, self.features
        kernel, bias = self._Params((k,) * 3 + (1, C), k**3, name="conv")()

        banded = (jax.default_backend() == "tpu" if self.use_zbanded is None
                  else self.use_zbanded)
        if not banded:
            out = jax.lax.conv_general_dilated(
                x, kernel, (1, 1, 1), [(k // 2, k // 2)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return out + bias

        B, X, Y, Z, _ = x.shape
        img = x[..., 0]  # (B, X, Y, Z) as NHWC with C=Z
        half = k // 2
        k2 = zbanded_kernel(kernel, Z)
        out = jax.lax.conv_general_dilated(
            img, k2.reshape(k, k, Z, Z * C), (1, 1), [(half, half)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.reshape(B, X, Y, Z, C) + bias


def zbanded_kernel(kernel, Z: int):
    """(k, k, k, 1, C) conv3d kernel -> z-banded (k, k, Z, Z, C) 2D kernel:
    k2[kx, ky, zin, zout, c] = kernel[kx, ky, kz, 0, c] at
    kz = zin - zout + k//2 (cross-correlation), zero elsewhere — the exact
    channel-folded form of the conv3d, including its zero z-padding.
    Shared by ZBandedConvStem and the fused Pallas stem+pool kernel."""
    k, _, _, _, C = kernel.shape
    k2 = jnp.zeros((k, k, Z, Z, C), kernel.dtype)
    half = k // 2
    for kz in range(k):
        zout = jnp.arange(max(0, half - kz), Z - max(0, kz - half))
        zin = zout + kz - half
        tap = jnp.broadcast_to(
            kernel[:, :, kz, 0, :][:, :, None, :], (k, k, len(zout), C)
        )
        k2 = k2.at[:, :, zin, zout, :].set(tap)
    return k2
