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


def build_grasp_labels(scenes, size, n_grasps, seed):
    from giga_tpu.utils.synthetic_grasps import grasps_to_batch_arrays, sample_labeled_grasps

    rng = np.random.RandomState(seed + 1)
    per_scene = []
    pos_frac = []
    for mesh in scenes:
        gl = sample_labeled_grasps(mesh, size, n_grasps, rng)
        arrs = grasps_to_batch_arrays(gl, size)
        per_scene.append(arrs)
        pos_frac.append(arrs["label"].mean())
    print(f"grasp labels: {np.mean(pos_frac):.2f} positive fraction")
    return per_scene


def main(args):
    size = 0.3
    print(f"building {args.n_scenes} synthetic scenes...")
    scenes, tsdfs, occ_pts, occ_lbls = build_dataset(
        args.n_scenes, size, 40, args.n_occ, args.seed
    )
    test_mesh, test_tsdf = scenes[-1], tsdfs[-1]

    full_giga = args.mode == "giga"
    grasp_data = build_grasp_labels(scenes, size, args.n_grasps, args.seed) if full_giga else None

    net, cfg = get_network("giga" if full_giga else "giga_geo")
    lr = args.lr
    if args.cosine_lr:
        import optax

        lr = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    clip = args.clip_norm if args.clip_norm > 0 else None
    state = create_train_state(net, cfg, jax.random.PRNGKey(args.seed), lr=lr,
                               clip_norm=clip, skip_nonfinite=True)
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
        if full_giga:
            gsel = [grasp_data[i] for i in idx]
            # class-balanced sampling, like the reference's clean_balance step
            gi = []
            for g in gsel:
                lbl = g["label"]
                pool = np.nonzero(lbl == (1.0 if rng.rand() < 0.5 else 0.0))[0]
                if len(pool) == 0:
                    pool = np.arange(len(lbl))
                gi.append(int(pool[rng.randint(len(pool))]))
            batch["pos"] = jnp.asarray([g["pos"][k] for g, k in zip(gsel, gi)])
            batch["label"] = jnp.asarray([g["label"][k] for g, k in zip(gsel, gi)])
            batch["rotations"] = jnp.asarray([g["rotations"][k] for g, k in zip(gsel, gi)])
            batch["width"] = jnp.asarray([g["width"][k] for g, k in zip(gsel, gi)])
        state, terms = step(state, batch)
        if it % 50 == 0 or it == args.steps - 1:
            msg = f"step {it}: loss {float(terms['loss_all']):.4f}"
            if full_giga and "accuracy" not in terms:
                msg += f" qual {float(terms['loss_qual']):.3f}"
            print(msg, flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    if args.save_params:
        from giga_tpu.models.registry import save_params

        save_params(state.params, args.save_params)
        print(f"saved params to {args.save_params}")

    if full_giga:
        return check_planner(net, cfg, state, test_mesh, test_tsdf, size, args)

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


def check_planner(net, cfg, state, test_mesh, test_tsdf, size, args):
    """Plan on the held-out scene and score the top grasps with the oracle."""
    from scipy.spatial import cKDTree

    from giga_tpu.inference.planner import GIGAPlanner, State
    from giga_tpu.utils.synthetic_grasps import evaluate_grasp

    planner = GIGAPlanner(
        net=net, model_cfg=cfg, params=state.params,
        qual_th=args.planner_qual_th, low_th=0.1, best=True, force_detection=True,
        rng=np.random.RandomState(0),
    )
    grasps, scores, toc = planner(State(tsdf=test_tsdf[None]))
    print(f"planner returned {len(grasps)} grasps in {toc * 1e3:.1f} ms")
    if not grasps:
        print("SELFCHECK FAILED: no grasps returned")
        return 1

    rng = np.random.RandomState(123)
    surf, _ = test_mesh.sample_surface(20000, rng=rng)
    tree = cKDTree(surf)
    top = grasps[: args.top_k]
    dists = [float(tree.query(g.pose.translation)[0]) for g in top]
    labels = [evaluate_grasp(test_mesh, surf, g.pose, rng)[0] for g in top]
    gsr = 100.0 * np.mean(labels)
    print(
        f"held-out scene: top-{len(top)} synthetic GSR {gsr:.0f}%, "
        f"median surface distance {np.median(dists) * 1e3:.1f} mm"
    )
    ok = gsr >= args.gsr_threshold and np.median(dists) < 0.06
    print(f"SELFCHECK {'PASSED' if ok else 'FAILED'}: GSR {gsr:.0f}% "
          f"(threshold {args.gsr_threshold}%)")
    return 0 if ok else 1


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["geo", "giga"], default="geo")
    parser.add_argument("--n-scenes", type=int, default=24)
    parser.add_argument("--n-occ", type=int, default=8192)
    parser.add_argument("--n-grasps", type=int, default=64)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--batch-occ", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument("--gsr-threshold", type=float, default=30.0)
    parser.add_argument("--planner-qual-th", type=float, default=0.8)
    parser.add_argument("--top-k", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--clip-norm", type=float, default=1.0,
                        help="global-norm gradient clip (loss spikes on the"
                             " small synthetic set can otherwise NaN a run);"
                             " pass 0 to disable")
    parser.add_argument("--cosine-lr", action="store_true",
                        help="cosine-decay the learning rate over --steps")
    parser.add_argument("--save-params", type=str, default="",
                        help="save trained params (msgpack) to this path")
    sys.exit(main(parser.parse_args()))
