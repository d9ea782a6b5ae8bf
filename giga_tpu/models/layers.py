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
