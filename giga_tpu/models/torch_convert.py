"""One-way converter: reference torch ``state_dict`` -> giga_tpu param pytree.

Maps the reference's module names (src/vgn/networks.py + ConvONets) onto the
flax tree, transposing weight layouts:
    Conv3d (O, I, D, H, W)        -> (D, H, W, I, O)
    Conv2d (O, I, H, W)           -> (H, W, I, O)
    ConvTranspose2d (I, O, kH, kW)-> (I, kH, kW, O)
    Linear (O, I)                 -> (I, O)
The three affordance decoders (qual/rot/width) stack into the fused
``decoder_aff`` head axis; fc_out weights are zero-padded to the shared
out_dim of 4.

Accepts a path to a ``.pt`` file (loaded with torch, CPU) or an
already-loaded mapping of numpy arrays.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from giga_tpu.core.config import GIGAConfig, VGNConfig


def _to_numpy(state_dict):
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def load_torch_state_dict(path):
    import torch

    obj = torch.load(Path(path), map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return _to_numpy(obj)


def _conv3d(sd, key):
    return {"kernel": sd[key + ".weight"].transpose(2, 3, 4, 1, 0), "bias": sd[key + ".bias"]}


def _conv2d(sd, key):
    return {"kernel": sd[key + ".weight"].transpose(2, 3, 1, 0), "bias": sd[key + ".bias"]}


def _deconv2d(sd, key):
    return {"kernel": sd[key + ".weight"].transpose(0, 2, 3, 1), "bias": sd[key + ".bias"]}


def _groupnorm(sd, key):
    return {"scale": sd[key + ".weight"], "bias": sd[key + ".bias"]}


def _single_conv_gcr(sd, prefix):
    return {
        "groupnorm": _groupnorm(sd, prefix + ".groupnorm"),
        "conv": {"conv": {"kernel": sd[prefix + ".conv.weight"].transpose(2, 3, 4, 1, 0)}},
    }


def convert_unet3d_params(sd, prefix, num_levels):
    """Reference UNet3D (unet3d.py:361-500, 'gcr' DoubleConv) -> flax tree.

    Torch names: {prefix}.encoders.{i}.basic_module.SingleConv{1,2}.*,
    {prefix}.decoders.{i}.basic_module.*, {prefix}.final_conv.*
    """
    p = (prefix + ".") if prefix else ""
    out = {}
    for i in range(num_levels):
        out[f"encoders_{i}"] = {
            c: _single_conv_gcr(sd, f"{p}encoders.{i}.basic_module.{c}")
            for c in ("SingleConv1", "SingleConv2")
        }
    for i in range(num_levels - 1):
        out[f"decoders_{i}"] = {
            c: _single_conv_gcr(sd, f"{p}decoders.{i}.basic_module.{c}")
            for c in ("SingleConv1", "SingleConv2")
        }
    out["final_conv"] = {"conv": _conv3d(sd, f"{p}final_conv")}
    return out


def _dense(sd, key, bias=True):
    out = {"kernel": sd[key + ".weight"].T}
    if bias:
        out["bias"] = sd[key + ".bias"]
    return out


def _resnet_fc(sd, prefix):
    out = {"fc_0": _dense(sd, prefix + ".fc_0"), "fc_1": _dense(sd, prefix + ".fc_1")}
    if prefix + ".shortcut.weight" in sd:
        out["shortcut"] = _dense(sd, prefix + ".shortcut", bias=False)
    return out


def convert_patch_decoder_state_dict(sd: dict, n_blocks: int = 5) -> dict:
    """Reference PatchLocalDecoder (decoder.py:208-301) -> flax param tree
    for models/decoder.py::PatchLocalDecoder."""
    sd = _to_numpy(sd)
    params = {"fc_p": _dense(sd, "fc_p"), "fc_out": _dense(sd, "fc_out")}
    for i in range(n_blocks):
        params[f"fc_c{i}"] = _dense(sd, f"fc_c.{i}")
        params[f"block{i}"] = _resnet_fc(sd, f"blocks.{i}")
    return {"params": params}


def convert_pointnet_state_dict(sd: dict, n_blocks: int = 5) -> dict:
    """Reference LocalPoolPointnet (pointnet.py:11-157) -> flax param tree.

    Handles both the triplane (unet) and grid (unet3d) variants; the U-Net
    depth / level count is inferred from the state_dict keys.
    """
    sd = _to_numpy(sd)
    params = {"fc_pos": _dense(sd, "fc_pos"), "fc_c": _dense(sd, "fc_c")}
    for i in range(n_blocks):
        params[f"block{i}"] = _resnet_fc(sd, f"blocks.{i}")
    unet_downs = {int(k.split(".")[2]) for k in sd if k.startswith("unet.down_convs.")}
    if unet_downs:
        params["unet"] = _unet_params(sd, "unet", max(unet_downs) + 1)
    unet3d_encs = {int(k.split(".")[2]) for k in sd if k.startswith("unet3d.encoders.")}
    if unet3d_encs:
        params["unet3d"] = convert_unet3d_params(sd, "unet3d", max(unet3d_encs) + 1)
    return {"params": params}


def _unet_params(sd, prefix, depth):
    unet = {}
    for i in range(depth):
        unet[f"down{i}"] = {
            "conv1": {"conv": _conv2d(sd, f"{prefix}.down_convs.{i}.conv1")},
            "conv2": {"conv": _conv2d(sd, f"{prefix}.down_convs.{i}.conv2")},
        }
    for i in range(depth - 1):
        unet[f"up{i}"] = {
            "upconv": _deconv2d(sd, f"{prefix}.up_convs.{i}.upconv"),
            "conv1": {"conv": _conv2d(sd, f"{prefix}.up_convs.{i}.conv1")},
            "conv2": {"conv": _conv2d(sd, f"{prefix}.up_convs.{i}.conv2")},
        }
    unet["conv_final"] = {"conv": _conv2d(sd, f"{prefix}.conv_final")}
    return unet


def _stacked_decoder(sd, head_names, n_blocks, out_dim):
    """Stack per-head LocalDecoder weights into the fused layout."""
    heads = len(head_names)

    def stack_linear(key_fmt, transpose=True):
        ws, bs = [], []
        for name in head_names:
            w = sd[key_fmt.format(name) + ".weight"]
            b = sd[key_fmt.format(name) + ".bias"]
            ws.append(w.T if transpose else w)
            bs.append(b)
        return np.stack(ws), np.stack(bs)

    dec = {}
    w, b = stack_linear("{}.fc_p")
    dec["fc_p_kernel"], dec["fc_p_bias"] = w, b
    for i in range(n_blocks):
        w, b = stack_linear("{}.fc_c." + str(i))
        dec[f"fc_c{i}_kernel"], dec[f"fc_c{i}_bias"] = w, b
        w, b = stack_linear("{}.blocks." + str(i) + ".fc_0")
        dec[f"block{i}_fc0_kernel"], dec[f"block{i}_fc0_bias"] = w, b
        w, b = stack_linear("{}.blocks." + str(i) + ".fc_1")
        dec[f"block{i}_fc1_kernel"], dec[f"block{i}_fc1_bias"] = w, b

    hidden = dec["fc_p_kernel"].shape[-1]
    wk = np.zeros((heads, hidden, out_dim), np.float32)
    bk = np.zeros((heads, out_dim), np.float32)
    for h, name in enumerate(head_names):
        w = sd[f"{name}.fc_out.weight"]  # (o, hidden)
        b = sd[f"{name}.fc_out.bias"]
        wk[h, :, : w.shape[0]] = w.T
        bk[h, : b.shape[0]] = b
    dec["fc_out_kernel"], dec["fc_out_bias"] = wk, bk
    return dec


def convert_giga_state_dict(sd: dict, cfg: GIGAConfig) -> dict:
    sd = _to_numpy(sd)
    encoder = {"conv_in": {"conv": _conv3d(sd, "encoder.conv_in")}}
    if "grid" in cfg.encoder.plane_types:
        encoder["unet3d"] = convert_unet3d_params(
            sd, "encoder.unet3d", cfg.encoder.unet3d.num_levels
        )
    else:
        encoder["unet"] = _unet_params(sd, "encoder.unet", cfg.encoder.unet.depth)
    params = {"encoder": encoder}
    if cfg.has_affordance:
        params["decoder_aff"] = _stacked_decoder(
            sd, ["decoder_qual", "decoder_rot", "decoder_width"], cfg.decoder.n_blocks, out_dim=4
        )
    if cfg.decoder_tsdf:
        params["decoder_occ"] = _stacked_decoder(
            sd, ["decoder_tsdf"], cfg.decoder.n_blocks, out_dim=1
        )
    return {"params": params}


def convert_vgn_state_dict(sd: dict) -> dict:
    sd = _to_numpy(sd)
    params = {}
    for i in (1, 2, 3):
        params[f"enc_conv{i}"] = {"conv": _conv3d(sd, f"encoder.conv{i}")}
        params[f"dec_conv{i}"] = {"conv": _conv3d(sd, f"decoder.conv{i}")}
    for head in ("conv_qual", "conv_rot", "conv_width"):
        params[head] = {"conv": _conv3d(sd, head)}
    return {"params": params}


def convert_torch_checkpoint(path, cfg):
    sd = load_torch_state_dict(path)
    if isinstance(cfg, VGNConfig):
        return convert_vgn_state_dict(sd)
    return convert_giga_state_dict(sd, cfg)


def convert_global_voxel_encoder_state_dict(sd: dict) -> dict:
    """Reference VoxelEncoder (voxels.py:123-156) -> GlobalVoxelEncoder tree.

    The final FC consumes torch's channel-major flatten of the (B, 512, 2, 2,
    2) block; our channels-last flatten is (d, h, w, c)-major, so the FC
    weight rows are permuted to match.
    """
    sd = _to_numpy(sd)
    params = {"conv_in": _conv3d(sd, "conv_in")}
    for i in range(4):
        params[f"conv_{i}"] = _conv3d(sd, f"conv_{i}")
    w = sd["fc.weight"]  # (c_dim, 512 * 2 * 2 * 2), rows (c, d, h, w)-major
    c_dim = w.shape[0]
    w = w.reshape(c_dim, 512, 2, 2, 2).transpose(2, 3, 4, 1, 0).reshape(-1, c_dim)
    params["fc"] = {"kernel": w, "bias": sd["fc.bias"]}
    return {"params": params}
