"""Learned crop model (PatchLocalPoolPointnet + PatchLocalDecoder) and the
sliding-window generation built on it."""

import numpy as np
import jax
import jax.numpy as jnp

from giga_tpu.core.config import EncoderConfig
from giga_tpu.models.crop import (
    CropGenerator,
    CropOccupancyNet,
    crop_plane_indices,
    crop_query_coords,
)


def tiny_net(reso=8, hidden=16, n_blocks=2):
    return CropOccupancyNet(
        EncoderConfig(c_dim=16, plane_resolution=reso),
        hidden_dim=hidden, n_blocks=n_blocks, unit_size=0.05,
    )


def init_on(net, rng, lo, hi, T=64, N=32):
    r = np.random.RandomState(0)
    p = jnp.asarray(r.uniform(lo, hi, (1, T, 3)), jnp.float32)
    q = jnp.asarray(r.uniform(lo, hi, (1, N, 3)), jnp.float32)
    vol = (np.full(3, lo, np.float32), np.full(3, hi, np.float32))
    idx = crop_plane_indices(p, vol, net.cfg.plane_resolution)
    q_n = crop_query_coords(q, vol)
    params = net.init(rng, p, idx, q, q_n)
    return params, p, idx, q, q_n, vol


class TestCropModel:
    def test_forward_shapes_and_grads(self):
        net = tiny_net()
        params, p, idx, q, q_n, _ = init_on(net, jax.random.PRNGKey(0), 0.0, 0.4)
        out = net.apply(params, p, idx, q, q_n)
        assert out.shape == (1, 32)

        def loss(pp):
            return jnp.sum(net.apply(pp, p, idx, q, q_n) ** 2)

        g = jax.grad(loss)(params)
        total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
        assert np.isfinite(float(total)) and float(total) > 0

    def test_translation_equivariance(self):
        """Shifting crop + contents by a multiple of unit_size must not change
        the prediction: the networks only see crop-relative geometry."""
        net = tiny_net()
        params, p, idx, q, q_n, vol = init_on(net, jax.random.PRNGKey(1), 0.0, 0.4)
        out0 = net.apply(params, p, idx, q, q_n)

        shift = np.float32(10 * net.unit_size)  # exact multiple of unit_size
        vol2 = (vol[0] + shift, vol[1] + shift)
        p2, q2 = p + shift, q + shift
        idx2 = crop_plane_indices(p2, vol2, net.cfg.plane_resolution)
        q_n2 = crop_query_coords(q2, vol2)
        out1 = net.apply(params, p2, idx2, q2, q_n2)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=2e-4)

    def test_index_layout_matches_decoder_sampling(self):
        """A point scattered at cell (i0, i1) must land where the decoder's
        normalized sampling reads plane[row=i1, col=i0]."""
        reso = 8
        vol = (np.zeros(3, np.float32), np.ones(3, np.float32))
        # point in the middle of cell (i0, i1) = (2, 5) of the xz plane
        pt = np.array([[[ (2 + 0.5) / reso, 0.5, (5 + 0.5) / reso ]]], np.float32)
        idx = crop_plane_indices(jnp.asarray(pt), vol, reso)
        assert int(idx["xz"][0, 0]) == 5 * reso + 2
        u = crop_query_coords(jnp.asarray(pt), vol)["xz"]
        np.testing.assert_allclose(
            np.asarray(u[0, 0]), [(2 + 0.5) / reso, (5 + 0.5) / reso], atol=1e-6
        )


class TestLearnedCropReconstruction:
    def test_sphere_end_to_end(self):
        """Train the crop model on one sphere's occupancy and reconstruct it
        through the sliding-window generator (multiple crops)."""
        import optax

        from giga_tpu.utils.synthetic import icosphere

        size = 0.4
        mesh = icosphere(0.12, np.array([0.2, 0.2, 0.2]), subdivisions=2)
        r = np.random.RandomState(0)
        surface, _ = mesh.sample_surface(4000, rng=r)

        net = tiny_net(reso=16, hidden=16, n_blocks=2)
        reso = net.cfg.plane_resolution
        T, N = 512, 256
        input_crop, query_crop = 0.3, 0.2

        from giga_tpu.geometry.native import check_mesh_contains

        def make_batch(rs):
            lo = rs.uniform(-0.05, size - query_crop + 0.05, 3).astype(np.float32)
            center = lo + query_crop / 2
            in_lo = (center - input_crop / 2).astype(np.float32)
            in_hi = (center + input_crop / 2).astype(np.float32)
            mask = np.all((surface >= in_lo) & (surface <= in_hi), axis=1)
            crop_pts = surface[mask]
            if len(crop_pts) == 0:
                crop_pts = in_lo[None] + 1e-3
            p = crop_pts[rs.randint(0, len(crop_pts), T)].astype(np.float32)
            q = rs.uniform(lo, lo + query_crop, (N, 3)).astype(np.float32)
            occ = check_mesh_contains(mesh, q).astype(np.float32)
            return p[None], q[None], occ[None], in_lo, in_hi

        params = None
        opt = optax.adam(5e-4)

        @jax.jit
        def step(params, opt_state, p, q, occ, lo, hi):
            idx = crop_plane_indices(p, (lo, hi), reso)
            q_n = crop_query_coords(q, (lo, hi))

            def loss_fn(pp):
                logits = net.apply(pp, p, idx, q, q_n)
                return optax.sigmoid_binary_cross_entropy(logits, occ).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, upd), opt_state, loss

        p, q, occ, lo, hi = make_batch(r)
        idx = crop_plane_indices(jnp.asarray(p), (lo, hi), reso)
        q_n = crop_query_coords(jnp.asarray(q), (lo, hi))
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(p), idx,
                          jnp.asarray(q), q_n)
        opt_state = opt.init(params)

        losses = []
        for i in range(240):
            p, q, occ, lo, hi = make_batch(r)
            params, opt_state, loss = step(params, opt_state, p, q, occ, lo, hi)
            losses.append(float(loss))
        assert np.mean(losses[-40:]) < np.mean(losses[:40]) * 0.7

        gen = CropGenerator(net, params, n_crop_points=T, resolution=16)
        rec = gen.generate_mesh(surface, query_crop_size=query_crop,
                                input_crop_size=input_crop)
        assert len(rec.faces) > 0
        # reconstructed surface should hug the sphere
        d = np.abs(np.linalg.norm(rec.vertices - np.array([0.2, 0.2, 0.2]), axis=1) - 0.12)
        assert np.median(d) < 0.03, f"median surface error {np.median(d):.4f}"


class TestCropGeneratorGridWiring:
    """A grid-configured crop model must actually exercise the 3D branch
    through CropGenerator (round-3 fix: grid indices/query coords are wired,
    not silently dropped)."""

    def test_grid_branch_flows_through_generator(self):
        from giga_tpu.core.config import UNet3DConfig

        reso, greso, T, N = 8, 8, 64, 32
        net = CropOccupancyNet(
            EncoderConfig(
                c_dim=16, plane_resolution=reso,
                plane_types=("grid",), grid_resolution=greso,
                unet3d=UNet3DConfig(f_maps=8, num_levels=2, num_groups=2),
            ),
            hidden_dim=16, n_blocks=2, unit_size=0.05,
        )
        gen = CropGenerator.__new__(CropGenerator)
        CropGenerator.__init__(gen, net, params=None, n_crop_points=T,
                               resolution=8)
        r = np.random.RandomState(0)
        pts = r.uniform(0.0, 0.4, (200, 3)).astype(np.float32)
        vol = (np.zeros(3, np.float32), np.full(3, 0.4, np.float32))

        # init params through the same wiring the generator uses
        from giga_tpu.models.crop import crop_grid_indices
        p0 = jnp.asarray(pts[:T][None])
        idx = {"grid": crop_grid_indices(p0, vol, greso)}
        q0 = jnp.asarray(r.uniform(0, 0.4, (1, N, 3)), jnp.float32)
        q_n = crop_query_coords(q0, vol, plane_types=("grid",))
        gen.params = net.init(jax.random.PRNGKey(0), p0, idx, q0, q_n)

        planes = gen._encode_crop(pts, vol)
        assert set(planes.keys()) == {"grid"}
        assert planes["grid"].ndim == 5  # (B, D, H, W, C)
        logits = gen._eval_crop(planes, np.asarray(q0[0]), vol)
        assert logits.shape == (N,) and np.all(np.isfinite(logits))
