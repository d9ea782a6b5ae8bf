"""Reconstruction quality of a GIGA-Geo checkpoint on held-out synthetic
scenes: IoU / Chamfer-L1 / normal consistency / F-score vs ground truth.

The simulator-free analog of scripts/eval_geometry.py (reference
eval_geometry_voxel.py): scenes come from utils/synthetic.random_scene,
ground truth occupancy/pointclouds from the scene mesh itself, prediction
from geometry/generation.MeshGenerator. All geometry compared in the
normalized [-0.5, 0.5]^3 frame.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.geometry.eval import MeshEvaluator
from giga_tpu.geometry.generation import MeshGenerator
from giga_tpu.models.registry import get_network, load_params
from giga_tpu.utils.synthetic import make_occ_samples, mesh_to_tsdf, random_scene


def evaluate_geo_checkpoint(params_path, n_scenes=16, seed=2000, size=0.3,
                            resolution0=32, upsampling_steps=2,
                            net_name="giga_geo", n_eval_points=100000):
    net, _ = get_network(net_name)
    params = load_params(params_path)
    gen = MeshGenerator(net, params, resolution0=resolution0,
                        upsampling_steps=upsampling_steps)
    ev = MeshEvaluator(n_points=n_eval_points, rng=np.random.RandomState(0))
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(n_scenes):
        gt = random_scene(rng, size)
        tsdf = mesh_to_tsdf(gt, size, 40, rng=rng)
        pred, _ = gen.generate_mesh(tsdf)
        gt_n = gt.copy().apply_scale(1.0 / size).apply_translation([-0.5] * 3)
        pc_tgt, fidx = gt_n.sample_surface(n_eval_points,
                                           rng=np.random.RandomState(1))
        normals_tgt = gt_n.face_normals[fidx]
        pts, occ = make_occ_samples(gt, size, n_eval_points, rng)
        pts_n = (pts / size - 0.5).astype(np.float32)
        rows.append(ev.eval_mesh(pred, pc_tgt.astype(np.float32), normals_tgt,
                                 pts_n, occ.astype(bool)))
    keys = [k for k, v in rows[0].items() if np.isscalar(v) or np.ndim(v) == 0]
    return {k: float(np.mean([r[k] for r in rows])) for k in keys}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("params", type=str)
    ap.add_argument("--n-scenes", type=int, default=16)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--net", type=str, default="giga_geo")
    ap.add_argument("--resolution0", type=int, default=32)
    ap.add_argument("--upsampling-steps", type=int, default=2)
    args = ap.parse_args()
    out = evaluate_geo_checkpoint(
        args.params, args.n_scenes, args.seed, net_name=args.net,
        resolution0=args.resolution0, upsampling_steps=args.upsampling_steps,
    )
    print(json.dumps({k: round(v, 5) for k, v in out.items()}, indent=1))
