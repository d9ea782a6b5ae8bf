"""Independent torch implementation of the GIGA/VGN architectures for golden
parity tests.

This is test-only code: a from-scratch torch model of the architecture
described in SURVEY.md (triplane encoder -> U-Net planes -> grid_sample +
ResNet-FC decoders), used to (a) generate reference-format state_dicts for
converter tests and (b) produce golden outputs through torch's own
grid_sample / conv kernels, which is the numerical contract the JAX code must
match. Module/key names follow the reference checkpoint schema
(encoder.conv_in, encoder.unet.down_convs.{i}..., decoder_qual.fc_p, ...).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

PLANE_AXES = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}


def normalize_coordinate_t(p2, padding=0.0):
    u = p2 / (1 + padding + 1e-5) + 0.5
    u = torch.where(u >= 1, torch.full_like(u, 1 - 1e-5), u)
    return torch.clamp(u, min=0.0)


class GoldenResnetBlockFC(nn.Module):
    def __init__(self, size):
        super().__init__()
        self.fc_0 = nn.Linear(size, size)
        self.fc_1 = nn.Linear(size, size)
        nn.init.zeros_(self.fc_1.weight)

    def forward(self, x):
        net = self.fc_0(F.relu(x))
        dx = self.fc_1(F.relu(net))
        return x + dx


class GoldenLocalDecoder(nn.Module):
    """Query planes with grid_sample (border, align_corners), run FC stack."""

    def __init__(self, c_dim=32, hidden=32, n_blocks=5, out_dim=1, padding=0.0):
        super().__init__()
        self.padding = padding
        self.n_blocks = n_blocks
        cat_dim = 3 * c_dim
        self.fc_p = nn.Linear(3, hidden)
        self.fc_c = nn.ModuleList([nn.Linear(cat_dim, hidden) for _ in range(n_blocks)])
        self.blocks = nn.ModuleList([GoldenResnetBlockFC(hidden) for _ in range(n_blocks)])
        self.fc_out = nn.Linear(hidden, out_dim)

    def sample_plane(self, p, plane, plane_type):
        a0, a1 = PLANE_AXES[plane_type]
        u = normalize_coordinate_t(p[:, :, [a0, a1]], self.padding)
        vgrid = 2.0 * u[:, :, None] - 1.0  # (B, N, 1, 2)
        c = F.grid_sample(plane, vgrid, padding_mode="border", align_corners=True, mode="bilinear")
        return c.squeeze(-1)  # (B, C, N)

    def forward(self, p, planes):
        c = torch.cat(
            [self.sample_plane(p, planes[t], t) for t in ("xz", "xy", "yz")], dim=1
        ).transpose(1, 2)
        net = self.fc_p(p)
        for i in range(self.n_blocks):
            net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        return self.fc_out(F.relu(net)).squeeze(-1)


class GoldenDownConv(nn.Module):
    def __init__(self, ins, outs, pooling):
        super().__init__()
        self.pooling = pooling
        self.conv1 = nn.Conv2d(ins, outs, 3, padding=1)
        self.conv2 = nn.Conv2d(outs, outs, 3, padding=1)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        before = x
        if self.pooling:
            x = F.max_pool2d(x, 2, 2)
        return x, before


class GoldenUpConv(nn.Module):
    def __init__(self, ins, outs):
        super().__init__()
        self.upconv = nn.ConvTranspose2d(ins, outs, 2, stride=2)
        self.conv1 = nn.Conv2d(2 * outs, outs, 3, padding=1)
        self.conv2 = nn.Conv2d(outs, outs, 3, padding=1)

    def forward(self, from_down, from_up):
        x = torch.cat([self.upconv(from_up), from_down], dim=1)
        x = F.relu(self.conv1(x))
        return F.relu(self.conv2(x))


class GoldenUNet(nn.Module):
    def __init__(self, channels=32, depth=3, start_filts=32):
        super().__init__()
        downs, outs = [], channels
        for i in range(depth):
            ins = channels if i == 0 else outs
            outs = start_filts * (2**i)
            downs.append(GoldenDownConv(ins, outs, pooling=i < depth - 1))
        self.down_convs = nn.ModuleList(downs)
        ups = []
        for _ in range(depth - 1):
            ins, outs = outs, outs // 2
            ups.append(GoldenUpConv(ins, outs))
        self.up_convs = nn.ModuleList(ups)
        self.conv_final = nn.Conv2d(outs, channels, 1)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.xavier_normal_(m.weight)
                nn.init.zeros_(m.bias)

    def forward(self, x):
        skips = []
        for down in self.down_convs:
            x, before = down(x)
            skips.append(before)
        for i, up in enumerate(self.up_convs):
            x = up(skips[-(i + 2)], x)
        return self.conv_final(x)


class GoldenEncoder(nn.Module):
    """Conv3d stem + axis-mean triplane pooling + shared U-Net."""

    def __init__(self, c_dim=32):
        super().__init__()
        self.conv_in = nn.Conv3d(1, c_dim, 3, padding=1)
        self.unet = GoldenUNet(c_dim)

    def forward(self, x):
        # x: (B, R, R, R)
        feat = F.relu(self.conv_in(x.unsqueeze(1)))  # (B, C, X, Y, Z)
        planes = {
            "xz": feat.mean(dim=3).transpose(2, 3),  # (B, C, Z, X)
            "xy": feat.mean(dim=4).transpose(2, 3),  # (B, C, Y, X)
            "yz": feat.mean(dim=2).transpose(2, 3),  # (B, C, Z, Y)
        }
        return {t: self.unet(p) for t, p in planes.items()}


class GoldenGIGA(nn.Module):
    """Full model; state_dict keys match the reference checkpoint schema."""

    def __init__(self, c_dim=32, with_tsdf=True):
        super().__init__()
        self.encoder = GoldenEncoder(c_dim)
        self.decoder_qual = GoldenLocalDecoder(c_dim, out_dim=1)
        self.decoder_rot = GoldenLocalDecoder(c_dim, out_dim=4)
        self.decoder_width = GoldenLocalDecoder(c_dim, out_dim=1)
        if with_tsdf:
            self.decoder_tsdf = GoldenLocalDecoder(c_dim, out_dim=1)

    def forward(self, tsdf, p, p_tsdf=None):
        planes = self.encoder(tsdf)
        qual = torch.sigmoid(self.decoder_qual(p, planes))
        rot = F.normalize(self.decoder_rot(p, planes), dim=2)
        width = self.decoder_width(p, planes)
        out = {"qual": qual, "rot": rot, "width": width}
        if p_tsdf is not None:
            out["occ"] = self.decoder_tsdf(p_tsdf, planes)
        return out


class GoldenVGN(nn.Module):
    """Dense conv-deconv baseline; keys match the reference vgn checkpoints."""

    def __init__(self):
        super().__init__()

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv3d(1, 16, 5, stride=2, padding=2)
                self.conv2 = nn.Conv3d(16, 32, 3, stride=2, padding=1)
                self.conv3 = nn.Conv3d(32, 64, 3, stride=2, padding=1)

            def forward(self, x):
                x = F.relu(self.conv1(x))
                x = F.relu(self.conv2(x))
                return F.relu(self.conv3(x))

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv3d(64, 64, 3, padding=1)
                self.conv2 = nn.Conv3d(64, 32, 3, padding=1)
                self.conv3 = nn.Conv3d(32, 16, 5, padding=2)

            def forward(self, x):
                x = F.relu(self.conv1(x))
                x = F.interpolate(x, 10)
                x = F.relu(self.conv2(x))
                x = F.interpolate(x, 20)
                x = F.relu(self.conv3(x))
                return F.interpolate(x, 40)

        self.encoder = Enc()
        self.decoder = Dec()
        self.conv_qual = nn.Conv3d(16, 1, 5, padding=2)
        self.conv_rot = nn.Conv3d(16, 4, 5, padding=2)
        self.conv_width = nn.Conv3d(16, 1, 5, padding=2)

    def forward(self, x):
        x = self.decoder(self.encoder(x.unsqueeze(1)))
        qual = torch.sigmoid(self.conv_qual(x)).squeeze(1)
        rot = F.normalize(self.conv_rot(x), dim=1)
        width = self.conv_width(x).squeeze(1)
        return qual, rot, width
