"""Local implicit decoders (reference: ConvONets/conv_onet/models/decoder.py:61-176).

Per query point p: bilinearly sample each feature plane, concatenate to a
3*c_dim feature c (concat_feat=True), then run
    net = fc_p(p); for i in blocks: net = ResnetBlockFC(net + fc_c[i](c))
    out = fc_out(relu(net))
for every output head (qual, rot, width, occupancy).

TPU-first design: the reference instantiates independent LocalDecoder modules
per head and runs them sequentially over the same query features. Here the
heads that share query points (qual/rot/width) are STACKED into one module —
all per-head Linears become a single 3-way batched einsum so the whole decode
is one MXU matmul chain. The occupancy decoder stays separate because it is
queried at different points (and may need a stop-gradient on the features,
networks.py:144-169 'giga_detach').

Math (and parameter shapes per head) are identical to the reference, so a
torch checkpoint converts by stacking the per-head weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from giga_tpu.core.config import DecoderConfig
from giga_tpu.models.layers import torch_bias_init
from giga_tpu.ops.sampling import sample_planes_concat


def _stacked(shape_head, heads):
    return (heads,) + tuple(shape_head)


class StackedLocalDecoder(nn.Module):
    """``heads`` independent LocalDecoders evaluated in one einsum chain.

    Input: planes dict {t: (B, H, W, C)}, points (B, N, 3).
    Output: (heads, B, N, out_dim) raw head outputs (no activations).

    ``out_dim`` is the max over heads; converters zero-pad smaller heads and
    callers slice what they need (qual/width/occ use [..., 0], rot uses [..., :4]).
    """

    cfg: DecoderConfig = DecoderConfig()
    heads: int = 3
    out_dim: int = 4

    def _stack_param(self, name, shape_head, fan_in, zero=False):
        # weights and biases share one init on purpose: torch's
        # kaiming_uniform(a=sqrt(5)) bound for a Linear weight equals the
        # bias bound 1/sqrt(fan_in), so torch_bias_init covers both
        init = jax.nn.initializers.zeros if zero else torch_bias_init(fan_in)
        return self.param(name, init, _stacked(shape_head, self.heads))

    @nn.compact
    def __call__(self, planes: dict, p: jnp.ndarray, feature: jnp.ndarray | None = None):
        cfg = self.cfg
        h = cfg.hidden_size
        c_dim = cfg.c_dim * (3 if cfg.concat_feat else 1)

        if feature is None:
            feature = query_planes(planes, p, cfg)
        c = feature  # (B, N, c_dim)

        w_p = self._stack_param("fc_p_kernel", (3, h), 3)
        b_p = self._stack_param("fc_p_bias", (h,), 3)
        net = jnp.einsum("bnd,edk->ebnk", p, w_p) + b_p[:, None, None, :]

        for i in range(cfg.n_blocks):
            w_c = self._stack_param(f"fc_c{i}_kernel", (c_dim, h), c_dim)
            b_c = self._stack_param(f"fc_c{i}_bias", (h,), c_dim)
            net = net + jnp.einsum("bnc,eck->ebnk", c, w_c) + b_c[:, None, None, :]
            # ResnetBlockFC with stacked weights
            w0 = self._stack_param(f"block{i}_fc0_kernel", (h, h), h)
            b0 = self._stack_param(f"block{i}_fc0_bias", (h,), h)
            w1 = self._stack_param(f"block{i}_fc1_kernel", (h, h), h, zero=True)
            b1 = self._stack_param(f"block{i}_fc1_bias", (h,), h)
            hidden = jnp.einsum("ebnk,ekj->ebnj", jax.nn.relu(net), w0) + b0[:, None, None, :]
            dx = jnp.einsum("ebnk,ekj->ebnj", jax.nn.relu(hidden), w1) + b1[:, None, None, :]
            net = net + dx

        w_out = self._stack_param("fc_out_kernel", (h, self.out_dim), h)
        b_out = self._stack_param("fc_out_bias", (self.out_dim,), h)
        out = jnp.einsum("ebnk,eko->ebno", jax.nn.relu(net), w_out) + b_out[:, None, None, :]
        return out


class FCDecoder(nn.Module):
    """Single-linear decoder (reference: decoder.py:7-59): summed plane
    features concatenated with the point -> Linear -> scalar."""

    cfg: DecoderConfig = DecoderConfig()
    out_dim: int = 1

    @nn.compact
    def __call__(self, planes: dict, p: jnp.ndarray):
        from giga_tpu.ops.sampling import sample_grid, sample_plane

        def one(planes_b, p_b):
            c = 0
            for t, plane in planes_b.items():
                if t == "grid":
                    c = c + sample_grid(plane, p_b, self.cfg.padding)
                else:
                    c = c + sample_plane(plane, p_b, t, self.cfg.padding)
            return c

        c = jax.vmap(one)(planes, p)
        from giga_tpu.models.layers import TorchDense

        out = TorchDense(self.out_dim, name="fc")(jnp.concatenate([c, p], axis=-1))
        return out[..., 0] if self.out_dim == 1 else out


class PatchLocalDecoder(nn.Module):
    """Crop-trained decoder (reference: decoder.py:208-301): plane features
    are sampled with pre-normalized crop coordinates ('p_n'), and positions
    enter through per-voxel local coords with optional sin/cos encoding."""

    cfg: DecoderConfig = DecoderConfig()
    out_dim: int = 1
    local_coord: bool = True
    unit_size: float = 0.1
    pos_encoding: str = "linear"

    @nn.compact
    def __call__(self, p: jnp.ndarray, p_n: dict, planes: dict):
        """p (B, N, 3) raw points; p_n {t: (B, N, 2|3)} crop-normalized coords."""
        from giga_tpu.models.layers import ResnetBlockFC, TorchDense
        from giga_tpu.ops.sampling import map2local

        cfg = self.cfg
        h = cfg.hidden_size

        def sample_normalized(plane, u):
            """Bilinear sample with coords already in [0, 1]."""
            H, W, _ = plane.shape
            fx = jnp.clip(u[:, 0] * (W - 1), 0.0, W - 1)
            fy = jnp.clip(u[:, 1] * (H - 1), 0.0, H - 1)
            x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
            wx = (fx - x0)[:, None]
            wy = (fy - y0)[:, None]
            top = plane[y0, x0] * (1 - wx) + plane[y0, x0 + 1] * wx
            bot = plane[y0 + 1, x0] * (1 - wx) + plane[y0 + 1, x0 + 1] * wx
            return top * (1 - wy) + bot * wy

        def sample_normalized_grid(grid, u):
            """Trilinear sample of a [z, y, x, c] grid with coords in [0, 1]
            (reference sample_feature fea_type='3d': grid_sample on the
            (x, y, z) -> (W, H, D) axis mapping, border clamp)."""
            D, H, W, _ = grid.shape
            fx = jnp.clip(u[:, 0] * (W - 1), 0.0, W - 1)
            fy = jnp.clip(u[:, 1] * (H - 1), 0.0, H - 1)
            fz = jnp.clip(u[:, 2] * (D - 1), 0.0, D - 1)
            x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
            z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, D - 2)
            wx = (fx - x0)[:, None]
            wy = (fy - y0)[:, None]
            wz = (fz - z0)[:, None]

            def face(z):
                top = grid[z, y0, x0] * (1 - wx) + grid[z, y0, x0 + 1] * wx
                bot = grid[z, y0 + 1, x0] * (1 - wx) + grid[z, y0 + 1, x0 + 1] * wx
                return top * (1 - wy) + bot * wy

            return face(z0) * (1 - wz) + face(z0 + 1) * wz

        c = 0
        for t, plane in planes.items():
            if t == "grid":
                c = c + jax.vmap(sample_normalized_grid)(plane, p_n[t])
            else:
                c = c + jax.vmap(sample_normalized)(plane, p_n[t])

        if self.local_coord:
            p = map2local(p, self.unit_size, self.pos_encoding)
        net = TorchDense(h, name="fc_p")(p)
        for i in range(cfg.n_blocks):
            net = net + TorchDense(h, name=f"fc_c{i}")(c)
            net = ResnetBlockFC(name=f"block{i}")(net)
        out = TorchDense(self.out_dim, name="fc_out")(jax.nn.relu(net))
        return out[..., 0] if self.out_dim == 1 else out


class LocalPointDecoder(nn.Module):
    """Point-interpolation decoder (reference: decoder.py:303-391): features
    live on the input points; query features are gaussian-kernel weighted
    averages of point features, then the usual ResNet-FC stack."""

    cfg: DecoderConfig = DecoderConfig()
    out_dim: int = 1
    sigma: float = 0.1

    @nn.compact
    def __call__(self, points: jnp.ndarray, point_feats: jnp.ndarray, p: jnp.ndarray):
        """points (B, T, 3) + features (B, T, C); queries p (B, N, 3)."""
        from giga_tpu.models.layers import ResnetBlockFC, TorchDense

        cfg = self.cfg
        h = cfg.hidden_size
        # gaussian kernel weights: softmax over -||q - x||^2 / sigma^2
        d2 = jnp.sum((p[:, :, None, :] - points[:, None, :, :]) ** 2, axis=-1)
        w = jax.nn.softmax(-d2 / (self.sigma**2), axis=-1)
        c = jnp.einsum("bnt,btc->bnc", w, point_feats)

        net = TorchDense(h, name="fc_p")(p)
        for i in range(cfg.n_blocks):
            net = net + TorchDense(h, name=f"fc_c{i}")(c)
            net = ResnetBlockFC(name=f"block{i}")(net)
        out = TorchDense(self.out_dim, name="fc_out")(jax.nn.relu(net))
        return out[..., 0] if self.out_dim == 1 else out


def query_planes(planes: dict, p: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """Sample plane/grid features for a batch of query sets.

    planes: {t: (B, H, W, C)} (or {'grid': (B, D, H, W, C)}), p: (B, N, 3).
    concat_feat=True concatenates plane samples -> (B, N, 3C) (decoder.py:136-147);
    concat_feat=False sums them -> (B, N, C) (decoder.py:149-158) — the only
    sane mode for the 'grid' branch (the reference's grid+concat code path is
    unreachable: torch.cat over a raw tensor, decoder.py:138-146).
    """
    if cfg.concat_feat and "grid" not in planes:
        sampler = getattr(cfg, "sampler", "gather")
        if sampler in ("mm", "mm_highest"):
            from giga_tpu.ops.sampling import sample_planes_concat_mm

            prec = (jax.lax.Precision.HIGHEST
                    if sampler == "mm_highest" else None)

            def one_mm(planes_b, p_b):
                return sample_planes_concat_mm(
                    planes_b, p_b, cfg.padding, precision=prec)

            return jax.vmap(one_mm)(planes, p)

        def one(planes_b, p_b):
            return sample_planes_concat(planes_b, p_b, cfg.padding)

        return jax.vmap(one)(planes, p)

    from giga_tpu.ops.sampling import sample_grid, sample_plane

    def one_sum(planes_b, p_b):
        c = 0
        for t, plane in planes_b.items():
            if t == "grid":
                c = c + sample_grid(plane, p_b, cfg.padding)
            else:
                c = c + sample_plane(plane, p_b, t, cfg.padding)
        return c

    return jax.vmap(one_sum)(planes, p)
