"""End-to-end learning self-check: synthetic scenes -> train GIGA-Geo ->
reconstruct a held-out scene -> evaluate.

Exercises the full loop (data -> sharded-able train step -> implicit decode
-> hierarchical refinement -> marching tets -> mesh metrics) with real
learning, without requiring PyBullet or dataset downloads. Passes when the
held-out reconstruction beats the IoU threshold.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from giga_tpu.geometry.eval import MeshEvaluator
from giga_tpu.geometry.generation import MeshGenerator
from giga_tpu.models.registry import get_network
from giga_tpu.train.trainer import create_train_state, make_train_step
from giga_tpu.utils.synthetic import make_occ_samples, mesh_to_tsdf, random_scene


def build_dataset(n_scenes, size, resolution, n_occ, seed):
    rng = np.random.RandomState(seed)
    scenes, tsdfs, occ_pts, occ_lbls = [], [], [], []
    for _ in range(n_scenes):
        mesh = random_scene(rng, size)
        scenes.append(mesh)
        tsdfs.append(mesh_to_tsdf(mesh, size, resolution, rng=rng))
        pts, occ = make_occ_samples(mesh, size, n_occ, rng)
        occ_pts.append(pts / size - 0.5)
        occ_lbls.append(occ.astype(np.float32))
    return scenes, np.stack(tsdfs), np.stack(occ_pts), np.stack(occ_lbls)


def main(args):
    size = 0.3
    print(f"building {args.n_scenes} synthetic scenes...")
    scenes, tsdfs, occ_pts, occ_lbls = build_dataset(
        args.n_scenes, size, 40, args.n_occ, args.seed
    )
    test_mesh, test_tsdf = scenes[-1], tsdfs[-1]
    train_slice = slice(0, args.n_scenes - 1)

    net, cfg = get_network("giga_geo")
    state = create_train_state(net, cfg, jax.random.PRNGKey(args.seed))
    step = make_train_step(net, cfg)

    rng = np.random.RandomState(args.seed)
    n_train = args.n_scenes - 1
    t0 = time.time()
    for it in range(args.steps):
        idx = rng.randint(0, n_train, args.batch)
        sub = rng.randint(0, args.n_occ, (args.batch, args.batch_occ))
        batch = {
            "tsdf": jnp.asarray(tsdfs[idx]),
            "pos": jnp.zeros((args.batch, 3), jnp.float32),
            "pos_occ": jnp.asarray(occ_pts[idx[:, None], sub]),
            "occ": jnp.asarray(occ_lbls[idx[:, None], sub]),
        }
        state, terms = step(state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: occ loss {float(terms['loss_all']):.4f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    gen = MeshGenerator(net, state.params, resolution0=20, upsampling_steps=1)
    pred_mesh, stats = gen.generate_mesh(test_tsdf)
    print({k: round(v, 3) for k, v in stats.items()})

    gt = test_mesh.copy()
    gt.vertices = gt.vertices / size - 0.5
    ev_rng = np.random.RandomState(0)
    evaluator = MeshEvaluator(n_points=20000, rng=ev_rng)
    pts_tgt, _, normals_tgt = gt.sample_surface(20000, rng=ev_rng, return_normals=True)
    points_iou = ev_rng.uniform(-0.5, 0.5, (20000, 3)).astype(np.float32)
    from giga_tpu.geometry.native import check_mesh_contains

    occ_tgt = check_mesh_contains(gt, points_iou)
    out = evaluator.eval_mesh(pred_mesh, pts_tgt.astype(np.float32), normals_tgt,
                              points_iou, occ_tgt)
    print("held-out scene:", {k: round(float(v), 4) for k, v in out.items() if k != "empty"})
    ok = out["iou"] >= args.iou_threshold
    print(f"SELFCHECK {'PASSED' if ok else 'FAILED'}: IoU {out['iou']:.3f} "
          f"(threshold {args.iou_threshold})")
    return 0 if ok else 1


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-scenes", type=int, default=24)
    parser.add_argument("--n-occ", type=int, default=8192)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--batch-occ", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    sys.exit(main(parser.parse_args()))
