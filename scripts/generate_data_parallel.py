"""Self-supervised grasp-trial data generation
(reference: scripts/generate_data_parallel.py).

Per worker process: own PyBullet sim; per scene, Poisson(4)+1 objects are
spawned, 6 random viewpoints + 1 side view are rendered, a 120^3 TSDF gives
the surface cloud, and grasps_per_scene grasp points are sampled along
surface normals and executed at 6 yaw angles — the mid-point of the widest
success peak becomes the labeled sample.
"""

import argparse
import multiprocessing as mp
import sys
from pathlib import Path

import numpy as np
import scipy.signal as signal

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from giga_tpu.core import io
from giga_tpu.core.grasp import Grasp, Label
from giga_tpu.core.perception import camera_on_sphere, create_tsdf
from giga_tpu.core.transform import Rotation, Transform
from giga_tpu.sim.simulation import ClutterRemovalSim
from giga_tpu.utils.implicit import get_mesh_pose_list_from_world

OBJECT_COUNT_LAMBDA = 4
MAX_VIEWPOINT_COUNT = 6


def worker(args, rank):
    from tqdm import tqdm

    np.random.seed()
    np.random.seed(np.random.randint(0, 1000) + rank)
    sim = ClutterRemovalSim(args.scene, args.object_set, gui=args.sim_gui)
    finger_depth = sim.gripper.finger_depth
    grasps_per_worker = args.num_grasps // args.num_proc
    pbar = tqdm(total=grasps_per_worker, disable=rank != 0)

    if rank == 0:
        (args.root / "scenes").mkdir(parents=True, exist_ok=True)
        io.write_setup(
            args.root, sim.size, sim.camera.intrinsic,
            sim.gripper.max_opening_width, sim.gripper.finger_depth,
        )
        if args.save_scene:
            (args.root / "mesh_pose_list").mkdir(parents=True, exist_ok=True)

    for _ in range(grasps_per_worker // args.grasps_per_scene):
        object_count = np.random.poisson(OBJECT_COUNT_LAMBDA) + 1
        sim.reset(object_count)
        sim.save_state()

        depth_imgs, extrinsics = render_images(sim, MAX_VIEWPOINT_COUNT)
        depth_side, extr_side = render_side_images(sim, 1, args.random)

        tsdf = create_tsdf(sim.size, 120, depth_imgs, sim.camera.intrinsic, extrinsics)
        points, normals = tsdf.get_cloud(with_normals=True)
        inside = np.all((points >= sim.lower) & (points <= sim.upper), axis=1)
        points, normals = points[inside], normals[inside]
        if len(points) == 0:
            print("Point cloud empty, skipping scene")
            continue

        scene_id = io.write_sensor_data(args.root, depth_side, extr_side)
        if args.save_scene:
            mesh_pose_list = get_mesh_pose_list_from_world(sim.world, args.object_set)
            io.write_point_cloud(
                args.root, scene_id, np.asarray(mesh_pose_list, dtype=object),
                name="mesh_pose_list",
            )

        for _ in range(args.grasps_per_scene):
            point, normal = sample_grasp_point(points, normals, finger_depth)
            grasp, label = evaluate_grasp_point(sim, point, normal)
            io.write_grasp(args.root, scene_id, grasp, label)
            pbar.update()

    pbar.close()
    print(f"Process {rank} finished!")


def render_images(sim, n):
    origin = Transform(Rotation.identity(), np.r_[sim.size / 2, sim.size / 2, 0.0])
    h, w = sim.camera.intrinsic.height, sim.camera.intrinsic.width
    extrinsics = np.empty((n, 7), np.float32)
    depth_imgs = np.empty((n, h, w), np.float32)
    for i in range(n):
        r = np.random.uniform(1.6, 2.4) * sim.size
        theta = np.random.uniform(0.0, np.pi / 4.0)
        phi = np.random.uniform(0.0, 2.0 * np.pi)
        extrinsic = camera_on_sphere(origin, r, theta, phi)
        extrinsics[i] = extrinsic.to_list()
        depth_imgs[i] = sim.camera.render(extrinsic)[1]
    return depth_imgs, extrinsics


def render_side_images(sim, n=1, random=False):
    origin = Transform(
        Rotation.identity(), np.r_[sim.size / 2, sim.size / 2, sim.size / 3]
    )
    h, w = sim.camera.intrinsic.height, sim.camera.intrinsic.width
    extrinsics = np.empty((n, 7), np.float32)
    depth_imgs = np.empty((n, h, w), np.float32)
    for i in range(n):
        if random:
            r = np.random.uniform(1.6, 2.4) * sim.size
            theta = np.random.uniform(np.pi / 4.0, 5.0 * np.pi / 12.0)
            phi = np.random.uniform(-np.pi, -3.0 * np.pi / 8.0)
        else:
            r = 2 * sim.size
            theta = np.pi / 3.0
            phi = -np.pi / 2.0
        extrinsic = camera_on_sphere(origin, r, theta, phi)
        extrinsics[i] = extrinsic.to_list()
        depth_imgs[i] = sim.camera.render(extrinsic)[1]
    return depth_imgs, extrinsics


def sample_grasp_point(points, normals, finger_depth, eps=0.1):
    """Random upward-facing surface point pushed along its normal."""
    while True:
        idx = np.random.randint(len(points))
        point, normal = points[idx], normals[idx]
        if normal[2] > -0.1:
            break
    grasp_depth = np.random.uniform(-eps * finger_depth, (1.0 + eps) * finger_depth)
    return point + normal * grasp_depth, normal


def evaluate_grasp_point(sim, pos, normal, num_rotations=6):
    # grasp frame: approach along -normal
    z_axis = -normal
    x_axis = np.r_[1.0, 0.0, 0.0]
    if np.isclose(np.abs(np.dot(x_axis, z_axis)), 1.0, 1e-4):
        x_axis = np.r_[0.0, 1.0, 0.0]
    y_axis = np.cross(z_axis, x_axis)
    x_axis = np.cross(y_axis, z_axis)
    R = Rotation.from_matrix(np.vstack((x_axis, y_axis, z_axis)).T)

    yaws = np.linspace(0.0, np.pi, num_rotations)
    outcomes, widths = [], []
    for yaw in yaws:
        ori = R * Rotation.from_euler("z", yaw)
        sim.restore_state()
        candidate = Grasp(Transform(ori, pos), width=sim.gripper.max_opening_width)
        outcome, width = sim.execute_grasp(candidate, remove=False)
        outcomes.append(outcome)
        widths.append(width)

    # mid-point of the widest success run of yaw angles
    successes = (np.asarray(outcomes) == Label.SUCCESS).astype(float)
    if np.sum(successes):
        peaks, props = signal.find_peaks(x=np.r_[0, successes, 0], height=1, width=1)
        idx = peaks[np.argmax(props["widths"])] - 1
        ori = R * Rotation.from_euler("z", yaws[idx])
        width = widths[idx]
    return Grasp(Transform(ori, pos), width), int(np.max(outcomes))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("root", type=Path)
    parser.add_argument("--scene", type=str, choices=["pile", "packed"], default="pile")
    parser.add_argument("--object-set", type=str, default="blocks")
    parser.add_argument("--num-grasps", type=int, default=10000)
    parser.add_argument("--grasps-per-scene", type=int, default=120)
    parser.add_argument("--num-proc", type=int, default=1)
    parser.add_argument("--save-scene", action="store_true", default=True)
    parser.add_argument("--random", action="store_true")
    parser.add_argument("--sim-gui", action="store_true")
    args = parser.parse_args()
    if args.num_proc > 1:
        pool = mp.Pool(processes=args.num_proc)
        for i in range(args.num_proc):
            pool.apply_async(func=worker, args=(args, i))
        pool.close()
        pool.join()
    else:
        worker(args, 0)
