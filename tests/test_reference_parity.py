"""True-golden parity: the JAX stack vs the reference's *actual* torch code.

Imports /root/reference/src/vgn (via tests/reference_oracle.py shims), builds
every shipped network family with seeded weights, pushes the real reference
state_dict through the checkpoint converter, and asserts the JAX forward
matches the reference forward — retiring tests/torch_golden.py as the sole
oracle (VERDICT round-1, item 1).

Also runs planner-level parity: the reference's own predict/process/bound/
select pipeline (detection_implicit.py:99-185) vs the jitted GIGAPlanner on
the same converted weights, asserting identical grasp lists.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from giga_tpu.inference.planner import GIGAPlanner, State
from giga_tpu.models.registry import get_network
from giga_tpu.models.torch_convert import convert_giga_state_dict, convert_vgn_state_dict

from tests.reference_oracle import build_reference_net, load_reference, reference_lattice

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def giga_pair():
    golden = build_reference_net("giga", seed=0)
    net, cfg = get_network("giga")
    params = convert_giga_state_dict(golden.state_dict(), cfg)
    return golden, net, params


class TestForwardParity:
    def test_giga(self, giga_pair):
        golden, net, params = giga_pair
        rng = np.random.RandomState(0)
        tsdf = rng.rand(2, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32)
        p_occ = rng.uniform(-0.5, 0.5, (2, 16, 3)).astype(np.float32)
        with torch.no_grad():
            q, r, w, occ = golden(
                torch.from_numpy(tsdf), torch.from_numpy(p), torch.from_numpy(p_occ)
            )
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), jnp.asarray(p_occ))
        np.testing.assert_allclose(np.asarray(ours["qual"]), q.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["rot"]), r.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["width"]), w.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["occ"]), occ.numpy(), atol=ATOL)

    def test_giga_encoder_planes(self, giga_pair):
        golden, net, params = giga_pair
        rng = np.random.RandomState(1)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        with torch.no_grad():
            gold_planes = golden.encoder(torch.from_numpy(tsdf))
        planes = net.apply(params, jnp.asarray(tsdf), method="encode")
        for t in ("xz", "xy", "yz"):
            ours = np.asarray(planes[t])[0].transpose(2, 0, 1)  # (C, H, W)
            np.testing.assert_allclose(ours, gold_planes[t][0].numpy(), atol=1e-5)

    def test_giga_aff(self):
        golden = build_reference_net("giga_aff", seed=3)
        net, cfg = get_network("giga_aff")
        params = convert_giga_state_dict(golden.state_dict(), cfg)
        rng = np.random.RandomState(4)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (1, 16, 3)).astype(np.float32)
        with torch.no_grad():
            q, r, w = golden(torch.from_numpy(tsdf), torch.from_numpy(p))
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), None)
        np.testing.assert_allclose(np.asarray(ours["qual"]), q.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["rot"]), r.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["width"]), w.numpy(), atol=ATOL)

    def test_giga_detach(self):
        golden = build_reference_net("giga_detach", seed=5)
        net, cfg = get_network("giga_detach")
        params = convert_giga_state_dict(golden.state_dict(), cfg)
        rng = np.random.RandomState(6)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (1, 8, 3)).astype(np.float32)
        with torch.no_grad():
            q, r, w, occ = golden(torch.from_numpy(tsdf), torch.from_numpy(p), torch.from_numpy(p))
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(ours["qual"]), q.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ours["occ"]), occ.numpy(), atol=ATOL)

    def test_giga_geo(self):
        golden = build_reference_net("giga_geo", seed=7)
        net, cfg = get_network("giga_geo")
        params = convert_giga_state_dict(golden.state_dict(), cfg)
        rng = np.random.RandomState(8)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        p_occ = rng.uniform(-0.5, 0.5, (1, 64, 3)).astype(np.float32)
        with torch.no_grad():
            occ = golden(torch.from_numpy(tsdf), torch.from_numpy(p_occ), torch.from_numpy(p_occ))
        ours = net.apply(params, jnp.asarray(tsdf), None, jnp.asarray(p_occ))
        np.testing.assert_allclose(np.asarray(ours["occ"]), occ.numpy(), atol=ATOL)

    def test_vgn(self):
        golden = build_reference_net("vgn", seed=9)
        net, _ = get_network("vgn")
        params = convert_vgn_state_dict(golden.state_dict())
        rng = np.random.RandomState(10)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        with torch.no_grad():
            gq, gr, gw = golden(torch.from_numpy(tsdf[:, None]))
        q, r, w = net.apply(params, jnp.asarray(tsdf))
        np.testing.assert_allclose(np.asarray(q), gq.numpy()[:, 0], atol=ATOL)
        np.testing.assert_allclose(np.asarray(r), gr.numpy().transpose(0, 2, 3, 4, 1), atol=ATOL)
        np.testing.assert_allclose(np.asarray(w), gw.numpy()[:, 0], atol=ATOL)


class TestGridVariantParity:
    """The 3D-feature-grid encoder branch (reference voxels.py:74-86 +
    unet3d.py:477), expressible in the reference's config system though not
    shipped as a preset."""

    GRID_CONFIG = {
        "encoder": "voxel_simple_local",
        "encoder_kwargs": {
            "plane_type": ["grid"],
            "grid_resolution": 40,
            "unet3d": True,
            "unet3d_kwargs": {
                "num_levels": 3, "f_maps": 32,
                "in_channels": 32, "out_channels": 32, "num_groups": 8,
            },
        },
        "decoder": "simple_local",
        "decoder_tsdf": True,
        "decoder_kwargs": {
            "dim": 3, "sample_mode": "bilinear", "hidden_size": 32,
            # concat_feat=False: the reference's grid+concat path is
            # unreachable (decoder.py:138-146 torch.cat over a raw tensor)
            "concat_feat": False,
        },
        "padding": 0,
        "c_dim": 32,
    }

    def test_grid_forward(self, ref):
        import sys

        sys.path.insert(0, "/root/reference/src")
        from vgn.ConvONets.conv_onet.config import get_model

        torch.manual_seed(21)
        golden = get_model(self.GRID_CONFIG).eval()
        net, cfg = get_network("giga_grid")
        params = convert_giga_state_dict(golden.state_dict(), cfg)

        rng = np.random.RandomState(22)
        tsdf = rng.rand(1, 40, 40, 40).astype(np.float32)
        p = rng.uniform(-0.5, 0.5, (1, 24, 3)).astype(np.float32)
        p_occ = rng.uniform(-0.5, 0.5, (1, 12, 3)).astype(np.float32)
        with torch.no_grad():
            q, r, w, occ = golden(
                torch.from_numpy(tsdf), torch.from_numpy(p), torch.from_numpy(p_occ)
            )
        ours = net.apply(params, jnp.asarray(tsdf), jnp.asarray(p), jnp.asarray(p_occ))
        # the 3D U-Net's groupnorm reductions accumulate in a different
        # order than torch; 5e-5 instead of the linear chains' 2e-5
        np.testing.assert_allclose(np.asarray(ours["qual"]), q.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(ours["rot"]), r.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(ours["width"]), w.numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(ours["occ"]), occ.numpy(), atol=5e-5)

    def test_unet3d_block(self, ref):
        import sys

        sys.path.insert(0, "/root/reference/src")
        from vgn.ConvONets.encoder.unet3d import UNet3D as RefUNet3D

        from giga_tpu.models.torch_convert import _to_numpy, convert_unet3d_params
        from giga_tpu.models.unet3d import UNet3D

        torch.manual_seed(0)
        golden = RefUNet3D(in_channels=32, out_channels=32, f_maps=32, num_levels=3).eval()
        params = {"params": convert_unet3d_params(_to_numpy(golden.state_dict()), "", 3)}
        rng = np.random.RandomState(0)
        x = rng.randn(1, 32, 12, 16, 20).astype(np.float32)  # odd sizes exercise
        with torch.no_grad():                                 # the nearest-resize
            gold = golden(torch.from_numpy(x)).numpy()
        ours = UNet3D(out_channels=32, f_maps=32, num_levels=3).apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 4, 1, 2, 3), gold, atol=5e-5
        )


class TestGlobalVoxelEncoderParity:
    """GlobalVoxelEncoder vs the reference's VoxelEncoder (the global-latent
    conv pyramid, ConvONets/encoder/voxels.py:123-156)."""

    def test_global_voxel_encoder(self, ref):
        from vgn.ConvONets.encoder.voxels import VoxelEncoder as RefVoxelEncoder

        from giga_tpu.models.encoder import GlobalVoxelEncoder
        from giga_tpu.models.torch_convert import (
            _to_numpy,
            convert_global_voxel_encoder_state_dict,
        )

        torch.manual_seed(7)
        golden = RefVoxelEncoder(c_dim=64).eval()
        params = convert_global_voxel_encoder_state_dict(_to_numpy(golden.state_dict()))
        rng = np.random.RandomState(7)
        x = rng.randn(2, 32, 32, 32).astype(np.float32)  # R=32 -> 2^3 block
        with torch.no_grad():
            gold = golden(torch.from_numpy(x)).numpy()
        ours = GlobalVoxelEncoder(c_dim=64).apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), gold, atol=2e-4)


class TestPointnetParity:
    """LocalPoolPointnet vs the reference's actual module (pointnet.py:11-157),
    both the triplane(+2D U-Net) and grid(+3D U-Net) variants, through the
    real torch_scatter call pattern (via the oracle shim)."""

    def _golden(self, **over):
        from vgn.ConvONets.encoder.pointnet import LocalPoolPointnet as RefLPP

        kwargs = dict(
            c_dim=32, dim=3, hidden_dim=32, scatter_type="max",
            plane_resolution=40, plane_type=["xz", "xy", "yz"],
            padding=0.1, n_blocks=5,
            unet=True, unet_kwargs={"depth": 3, "merge_mode": "concat", "start_filts": 32},
        )
        kwargs.update(over)
        torch.manual_seed(31)
        return RefLPP(**kwargs).eval()

    def test_triplane(self, ref):
        from giga_tpu.core.config import EncoderConfig
        from giga_tpu.models.pointnet import LocalPoolPointnet
        from giga_tpu.models.torch_convert import convert_pointnet_state_dict

        golden = self._golden()
        params = convert_pointnet_state_dict(golden.state_dict())
        cfg = EncoderConfig(padding=0.1)
        net = LocalPoolPointnet(cfg=cfg, hidden_dim=32, scatter_type="max")
        rng = np.random.RandomState(32)
        pts = rng.uniform(-0.5, 0.5, (2, 256, 3)).astype(np.float32)
        with torch.no_grad():
            gold = golden(torch.from_numpy(pts))
        ours = net.apply(params, jnp.asarray(pts))
        for t in ("xz", "xy", "yz"):
            np.testing.assert_allclose(
                np.asarray(ours[t]).transpose(0, 3, 1, 2), gold[t].numpy(), atol=2e-5
            )

    def test_grid(self, ref):
        from giga_tpu.core.config import EncoderConfig
        from giga_tpu.models.pointnet import LocalPoolPointnet
        from giga_tpu.models.torch_convert import convert_pointnet_state_dict

        golden = self._golden(
            plane_type=["grid"], grid_resolution=24, unet=False, unet_kwargs=None,
            unet3d=True,
            unet3d_kwargs={"num_levels": 3, "f_maps": 32,
                           "in_channels": 32, "out_channels": 32, "num_groups": 8},
        )
        params = convert_pointnet_state_dict(golden.state_dict())
        cfg = EncoderConfig(padding=0.1, plane_types=())
        net = LocalPoolPointnet(cfg=cfg, hidden_dim=32, scatter_type="max",
                                use_grid=True, grid_resolution=24)
        rng = np.random.RandomState(33)
        pts = rng.uniform(-0.5, 0.5, (1, 200, 3)).astype(np.float32)
        with torch.no_grad():
            gold = golden(torch.from_numpy(pts))["grid"].numpy()
        ours = np.asarray(net.apply(params, jnp.asarray(pts))["grid"])
        # the scatter itself is bit-exact (verified standalone); the slack is
        # groupnorm over a mostly-empty grid amplifying ~1e-6 MLP diffs
        np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), gold, atol=5e-4)


def _reference_plan(ref, golden, tsdf_vol, qual_th, force_detection, size=0.3):
    """Run the reference's own planner pipeline (detection_implicit.py:33-85)
    on a raw (1, 40, 40, 40) grid, returning metric (pos, quat, width, score)."""
    di = ref["detection_implicit"]
    R = 40
    voxel_size = size / R
    pos = reference_lattice(R)
    qual, rot, width = di.predict(tsdf_vol, pos, golden, torch.device("cpu"))
    qual = qual.reshape(R, R, R)
    rot = rot.reshape(R, R, R, 4)
    width = width.reshape(R, R, R)
    qual, rot, width = di.process(tsdf_vol, qual, rot, width, out_th=0.5)
    qual = di.bound(qual, voxel_size)
    grasps, scores = di.select(
        qual.copy(),
        pos.view(R, R, R, 3).cpu(),
        rot,
        width,
        threshold=qual_th,
        force_detection=force_detection,
        max_filter_size=4,
    )
    out = []
    for g, s in zip(grasps, scores):
        t = (g.pose.translation + 0.5) * size  # detection_implicit.py:70-74
        out.append((t, g.pose.rotation.as_quat(), g.width * size, float(s)))
    return out


def _structured_tsdf(seed=0):
    """A TSDF with free space, a surface band, and occluded space — yields
    many valid voxels after the reference's dilation mask."""
    rng = np.random.RandomState(seed)
    z = np.arange(40)[None, None, :]
    height = 8 + 6 * np.sin(np.arange(40) / 6.0)[:, None, None] + rng.rand(40, 40, 1) * 2
    tsdf = np.clip((z - height) / 4.0 + 1.0, 0.0, 1.0).astype(np.float32)
    return tsdf[None]  # (1, 40, 40, 40)


@pytest.fixture(scope="module")
def biased_giga_pair():
    """Seeded reference GIGA with the qual head biased up so sigmoid outputs
    clear the planner's LOW_TH=0.5 (random weights peak at ~0.48, which makes
    every pipeline run degenerate)."""
    golden = build_reference_net("giga", seed=0)
    with torch.no_grad():
        golden.decoder_qual.fc_out.bias += 1.0
    net, cfg = get_network("giga")
    params = convert_giga_state_dict(golden.state_dict(), cfg)
    return golden, net, params


class TestPlannerParity:
    @pytest.mark.parametrize("qual_th,force", [(0.65, False), (0.95, True)])
    def test_grasp_lists_match(self, ref, biased_giga_pair, qual_th, force):
        golden, net, params = biased_giga_pair
        tsdf_vol = _structured_tsdf()
        theirs = _reference_plan(ref, golden, tsdf_vol, qual_th, force)

        planner = GIGAPlanner(
            net=net, model_cfg=get_network("giga")[1], params=params,
            qual_th=qual_th, force_detection=force, best=True,
            max_grasps=256, rng=np.random.RandomState(0),
        )
        grasps, scores, _ = planner(State(tsdf=tsdf_vol))

        assert len(grasps) == len(theirs) > 0, "parity case must be non-degenerate"
        # match by voxel position (both sides sort by score; ties may reorder)
        ours_by_pos = {
            tuple(np.round(g.pose.translation / (0.3 / 40)).astype(int)): (g, s)
            for g, s in zip(grasps, scores)
        }
        for t, quat, w, s in theirs:
            key = tuple(np.round(t / (0.3 / 40)).astype(int))
            assert key in ours_by_pos
            g, score = ours_by_pos[key]
            np.testing.assert_allclose(g.pose.translation, t, atol=1e-5)
            np.testing.assert_allclose(g.width, w, atol=1e-5)
            assert score == pytest.approx(s, abs=1e-4)
            q_ours = g.pose.rotation.as_quat()
            assert min(np.abs(q_ours - quat).max(), np.abs(q_ours + quat).max()) < 1e-4


class TestPatchDecoderParity:
    """Crop decoder vs the reference's actual PatchLocalDecoder
    (decoder.py:208-301), both positional encodings."""

    @pytest.mark.parametrize("pos_encoding", ["linear", "sin_cos"])
    def test_patch_local_decoder(self, ref, pos_encoding):
        import importlib

        dec_mod = importlib.import_module("vgn.ConvONets.conv_onet.models.decoder")
        torch.manual_seed(11)
        golden = dec_mod.PatchLocalDecoder(
            dim=3, c_dim=32, hidden_size=32, n_blocks=3, local_coord=True,
            unit_size=0.1, pos_encoding=pos_encoding,
        )
        with torch.no_grad():
            for prm in golden.parameters():
                prm.data = torch.randn_like(prm) * 0.2

        rng = np.random.RandomState(12)
        H = W = 16
        planes_t = {
            t: torch.from_numpy(rng.randn(1, 32, H, W).astype(np.float32))
            for t in ("xz", "xy", "yz")
        }
        p = rng.uniform(0.0, 1.0, (1, 64, 3)).astype(np.float32)
        p_n = {
            t: rng.uniform(0.0, 1.0, (1, 64, 2)).astype(np.float32)
            for t in ("xz", "xy", "yz")
        }
        with torch.no_grad():
            gold = golden(
                {"p": torch.from_numpy(p),
                 "p_n": {t: torch.from_numpy(v) for t, v in p_n.items()}},
                planes_t,
            ).numpy()

        from giga_tpu.core.config import DecoderConfig
        from giga_tpu.models.decoder import PatchLocalDecoder
        from giga_tpu.models.torch_convert import convert_patch_decoder_state_dict

        mine = PatchLocalDecoder(
            DecoderConfig(c_dim=32, hidden_size=32, n_blocks=3), out_dim=1,
            local_coord=True, unit_size=0.1, pos_encoding=pos_encoding,
        )
        params = convert_patch_decoder_state_dict(golden.state_dict(), n_blocks=3)
        planes_j = {t: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
                    for t, v in planes_t.items()}
        out = mine.apply(params, jnp.asarray(p),
                         {t: jnp.asarray(v) for t, v in p_n.items()}, planes_j)
        np.testing.assert_allclose(np.asarray(out), gold, atol=ATOL)


class TestPatchEncoderParity:
    """Crop point encoder vs the reference's actual PatchLocalPoolPointnet
    (pointnet.py:159-313): same points, each side computing its own index
    convention (reference: i0 + reso*i1 flat ids; ours: i1*reso + i0 — both
    land on plane[row=second axis, col=first axis])."""

    def test_patch_local_pool_pointnet(self, ref):
        import importlib

        pnet_mod = importlib.import_module("vgn.ConvONets.encoder.pointnet")
        common = importlib.import_module("vgn.ConvONets.common")

        reso, cdim, hid, nb = 8, 16, 16, 3
        torch.manual_seed(21)
        golden = pnet_mod.PatchLocalPoolPointnet(
            c_dim=cdim, dim=3, hidden_dim=hid, scatter_type="max",
            unet=True, unet_kwargs={"depth": 2, "start_filts": 16,
                                    "merge_mode": "concat"},
            plane_resolution=reso, plane_type=["xz", "xy", "yz"], n_blocks=nb,
            local_coord=True, unit_size=0.1, pos_encoding="linear",
        )
        with torch.no_grad():
            for prm in golden.parameters():
                prm.data = torch.randn_like(prm) * 0.2

        rng = np.random.RandomState(22)
        T = 128
        lo = np.array([0.2, 0.1, 0.0], np.float32)
        hi = np.array([0.8, 0.7, 0.6], np.float32)
        pts = rng.uniform(lo, hi, (T, 3)).astype(np.float32)
        vol = (lo, hi)

        # reference-side indices via its own coord2index (mutates p: copy)
        ref_index = {}
        for t in ("xz", "xy", "yz"):
            idx = common.coord2index(
                torch.from_numpy(pts.copy()), np.stack(vol), reso=reso, plane=t
            )
            ref_index[t] = idx[None]  # (B=1, 1, T)
        with torch.no_grad():
            gold = golden({"points": torch.from_numpy(pts[None]),
                           "index": ref_index})

        from giga_tpu.core.config import EncoderConfig, UNet2DConfig
        from giga_tpu.models.crop import crop_plane_indices
        from giga_tpu.models.pointnet import PatchLocalPoolPointnet
        from giga_tpu.models.torch_convert import convert_pointnet_state_dict

        mine = PatchLocalPoolPointnet(
            EncoderConfig(c_dim=cdim, plane_resolution=reso,
                          unet=UNet2DConfig(depth=2, start_filts=16)),
            hidden_dim=hid, n_blocks=nb, scatter_type="max",
            local_coord=True, unit_size=0.1, pos_encoding="linear",
        )
        params = convert_pointnet_state_dict(golden.state_dict(), n_blocks=nb)
        my_index = crop_plane_indices(jnp.asarray(pts[None]), vol, reso)
        fea = mine.apply(params, jnp.asarray(pts[None]), my_index)
        for t in ("xz", "xy", "yz"):
            ours = np.asarray(fea[t])[0].transpose(2, 0, 1)  # (C, H, W)
            np.testing.assert_allclose(ours, gold[t][0].numpy(), atol=1e-4)

    def test_patch_local_pool_pointnet_grid_branch(self, ref):
        """Crop encoder 'grid' branch (scatter to reso_grid^3 + 3D U-Net) vs
        the reference's own module."""
        import importlib

        pnet_mod = importlib.import_module("vgn.ConvONets.encoder.pointnet")
        common = importlib.import_module("vgn.ConvONets.common")

        greso, cdim, hid, nb = 8, 16, 16, 2
        torch.manual_seed(31)
        golden = pnet_mod.PatchLocalPoolPointnet(
            c_dim=cdim, dim=3, hidden_dim=hid, scatter_type="max",
            unet=False, unet3d=True,
            unet3d_kwargs={"num_levels": 2, "f_maps": 8, "num_groups": 4,
                           "in_channels": cdim, "out_channels": cdim},
            grid_resolution=greso, plane_type=["grid"], n_blocks=nb,
            local_coord=True, unit_size=0.1, pos_encoding="linear",
        )
        with torch.no_grad():
            for prm in golden.parameters():
                prm.data = torch.randn_like(prm) * 0.2

        rng = np.random.RandomState(32)
        T = 128
        lo = np.zeros(3, np.float32)
        hi = np.ones(3, np.float32)
        pts = rng.uniform(lo, hi, (T, 3)).astype(np.float32)

        idx = common.coord2index(
            torch.from_numpy(pts.copy()), np.stack((lo, hi)), reso=greso,
            plane="grid",
        )
        with torch.no_grad():
            gold = golden({"points": torch.from_numpy(pts[None]),
                           "index": {"grid": idx[None]}})["grid"][0].numpy()

        from giga_tpu.core.config import EncoderConfig, UNet3DConfig
        from giga_tpu.models.crop import crop_grid_indices
        from giga_tpu.models.pointnet import PatchLocalPoolPointnet
        from giga_tpu.models.torch_convert import convert_pointnet_state_dict

        mine = PatchLocalPoolPointnet(
            EncoderConfig(c_dim=cdim, grid_resolution=greso,
                          unet3d=UNet3DConfig(f_maps=8, num_levels=2,
                                              num_groups=4)),
            hidden_dim=hid, n_blocks=nb, scatter_type="max",
            local_coord=True, unit_size=0.1, pos_encoding="linear",
        )
        params = convert_pointnet_state_dict(golden.state_dict(), n_blocks=nb)
        my_index = {"grid": crop_grid_indices(jnp.asarray(pts[None]), (lo, hi), greso)}
        fea = mine.apply(params, jnp.asarray(pts[None]), my_index)
        ours = np.asarray(fea["grid"])[0].transpose(3, 0, 1, 2)  # (C, z, y, x)
        np.testing.assert_allclose(ours, gold, atol=1e-4)


class TestPatchDecoderGridParity:
    def test_patch_local_decoder_grid_branch(self, ref):
        """Crop decoder 3D ('grid') feature sampling vs the reference's
        sample_feature(fea_type='3d') path."""
        import importlib

        dec_mod = importlib.import_module("vgn.ConvONets.conv_onet.models.decoder")
        torch.manual_seed(41)
        golden = dec_mod.PatchLocalDecoder(
            dim=3, c_dim=16, hidden_size=32, n_blocks=2, local_coord=True,
            unit_size=0.1, pos_encoding="linear",
        )
        with torch.no_grad():
            for prm in golden.parameters():
                prm.data = torch.randn_like(prm) * 0.2

        rng = np.random.RandomState(42)
        D = H = W = 6
        grid_t = torch.from_numpy(rng.randn(1, 16, D, H, W).astype(np.float32))
        p = rng.uniform(0.0, 1.0, (1, 48, 3)).astype(np.float32)
        u = rng.uniform(0.0, 1.0, (1, 48, 3)).astype(np.float32)
        with torch.no_grad():
            gold = golden(
                {"p": torch.from_numpy(p), "p_n": {"grid": torch.from_numpy(u)}},
                {"grid": grid_t},
            ).numpy()

        from giga_tpu.core.config import DecoderConfig
        from giga_tpu.models.decoder import PatchLocalDecoder
        from giga_tpu.models.torch_convert import convert_patch_decoder_state_dict

        mine = PatchLocalDecoder(
            DecoderConfig(c_dim=16, hidden_size=32, n_blocks=2), out_dim=1,
            local_coord=True, unit_size=0.1, pos_encoding="linear",
        )
        params = convert_patch_decoder_state_dict(golden.state_dict(), n_blocks=2)
        # torch grid (B, C, D, H, W) -> ours [z, y, x, c]
        grid_j = jnp.asarray(grid_t.numpy().transpose(0, 2, 3, 4, 1))
        out = mine.apply(params, jnp.asarray(p), {"grid": jnp.asarray(u)},
                         {"grid": grid_j})
        np.testing.assert_allclose(np.asarray(out), gold, atol=ATOL)
