"""Simulated clutter-removal benchmark
(reference: src/vgn/experiments/clutter_removal.py:22-245).

Protocol: per round, spawn N objects, then loop scan -> plan -> execute the
best grasp, until the table is clear, the planner finds nothing, or two
consecutive failures occur. Metrics: GSR = 100 * successes / attempts,
DR = 100 * successes / total objects.
"""

from __future__ import annotations

import uuid
from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd

from giga_tpu.core import io
from giga_tpu.core.grasp import Label
from giga_tpu.inference.planner import State
from giga_tpu.sim.simulation import ClutterRemovalSim

MAX_CONSECUTIVE_FAILURES = 2

GRASP_LOG_COLUMNS = [
    "round_id", "scene_id", "qx", "qy", "qz", "qw", "x", "y", "z",
    "width", "score", "label", "integration_time", "planning_time",
]


def run(
    grasp_plan_fn,
    logdir,
    description: str = "",
    scene: str = "pile",
    object_set: str = "blocks",
    num_objects: int = 5,
    n: int = 6,
    N=None,
    num_rounds: int = 40,
    seed: int = 1,
    sim_gui: bool = False,
    result_path=None,
    add_noise=False,
    sideview: bool = False,
    resolution: int = 40,
    silence: bool = False,
    visualize: bool = False,
    urdf_root: str = "data/urdfs",
):
    """Run several rounds; returns (success_rate, declutter_rate)."""
    import tqdm

    sim = ClutterRemovalSim(
        scene, object_set, gui=sim_gui, seed=seed, add_noise=add_noise,
        sideview=sideview, urdf_root=urdf_root,
    )
    logger = Logger(Path(logdir), description)

    attempts = success = total_objs = left_objs = cons_fail = no_grasp = 0
    planning_times, total_times = [], []

    for _ in tqdm.tqdm(range(num_rounds), disable=silence):
        sim.reset(num_objects)
        round_id = logger.last_round_id() + 1
        logger.log_round(round_id, sim.num_objects)
        total_objs += sim.num_objects

        consecutive_failures = 1
        last_label = None
        trial_id = -1
        while sim.num_objects > 0 and consecutive_failures < MAX_CONSECUTIVE_FAILURES:
            trial_id += 1
            timings = {}
            tsdf, pc, timings["integration"] = sim.acquire_tsdf(n=n, N=N, resolution=40)
            state = State(tsdf=tsdf, pc=pc)
            if resolution != 40:
                extra_tsdf, _, _ = sim.acquire_tsdf(n=n, N=N, resolution=resolution)
                state = State(tsdf=tsdf, pc=pc, tsdf_process=extra_tsdf)
            if len(pc) == 0:
                break  # empty point cloud, abort round

            if visualize:
                from giga_tpu.utils.implicit import (
                    get_mesh_pose_list_from_world,
                    get_scene_from_mesh_pose_list,
                )

                mesh_pose_list = get_mesh_pose_list_from_world(sim.world, object_set)
                scene_mesh = get_scene_from_mesh_pose_list(mesh_pose_list)
                grasps, scores, timings["planning"], visual_mesh = grasp_plan_fn(
                    state, scene_mesh
                )
                logger.log_mesh(scene_mesh, visual_mesh, f"round_{round_id:03d}_trial_{trial_id:03d}")
            else:
                grasps, scores, timings["planning"] = grasp_plan_fn(state)
            planning_times.append(timings["planning"])
            total_times.append(timings["planning"] + timings["integration"])

            if len(grasps) == 0:
                no_grasp += 1
                break  # no grasp hypothesis, abort round

            grasp, score = grasps[0], scores[0]
            label, _ = sim.execute_grasp(grasp, allow_contact=True)
            attempts += 1
            if label != Label.FAILURE:
                success += 1
            logger.log_grasp(round_id, state, timings, grasp, score, label)

            if last_label == Label.FAILURE and label == Label.FAILURE:
                consecutive_failures += 1
            else:
                consecutive_failures = 1
            if consecutive_failures >= MAX_CONSECUTIVE_FAILURES:
                cons_fail += 1
            last_label = label
        left_objs += sim.num_objects

    success_rate = 100.0 * success / max(attempts, 1)
    declutter_rate = 100.0 * success / max(total_objs, 1)
    print(f"Grasp success rate: {success_rate:.2f} %, Declutter rate: {declutter_rate:.2f} %")
    print(
        f"Average planning time: {np.mean(planning_times):.4f}s, "
        f"total time: {np.mean(total_times):.4f}s"
    )
    if result_path is not None:
        with open(result_path, "w") as f:
            f.write(f"{success_rate:.2f}%, {declutter_rate:.2f}%; {cons_fail}, {no_grasp}\n")
    return success_rate, declutter_rate


class Logger:
    """CSV + scene-snapshot logging for benchmark runs."""

    def __init__(self, root: Path, description: str):
        stamp = datetime.now().strftime("%y-%m-%d-%H-%M-%S")
        self.logdir = root / f"{stamp}_{description}".strip("_")
        self.scenes_dir = self.logdir / "scenes"
        self.scenes_dir.mkdir(parents=True, exist_ok=True)
        self.mesh_dir = self.logdir / "meshes"
        self.mesh_dir.mkdir(parents=True, exist_ok=True)
        self.rounds_csv_path = self.logdir / "rounds.csv"
        self.grasps_csv_path = self.logdir / "grasps.csv"
        if not self.rounds_csv_path.exists():
            io.create_csv(self.rounds_csv_path, ["round_id", "object_count"])
        if not self.grasps_csv_path.exists():
            io.create_csv(self.grasps_csv_path, GRASP_LOG_COLUMNS)

    def last_round_id(self) -> int:
        df = pd.read_csv(self.rounds_csv_path)
        return -1 if df.empty else int(df["round_id"].max())

    def log_round(self, round_id: int, object_count: int) -> None:
        io.append_csv(self.rounds_csv_path, round_id, object_count)

    def log_mesh(self, scene_mesh, aff_mesh, name: str) -> None:
        scene_mesh.export(self.mesh_dir / (name + "_scene.obj"))
        aff_mesh.export(self.mesh_dir / (name + "_aff.obj"))

    def log_grasp(self, round_id, state, timings, grasp, score, label) -> None:
        scene_id = uuid.uuid4().hex
        np.savez_compressed(
            self.scenes_dir / (scene_id + ".npz"),
            grid=state.tsdf.get_grid(),
            points=np.asarray(state.pc),
        )
        qx, qy, qz, qw = grasp.pose.rotation.as_quat()
        x, y, z = grasp.pose.translation
        io.append_csv(
            self.grasps_csv_path, round_id, scene_id, qx, qy, qz, qw, x, y, z,
            grasp.width, score, int(label),
            timings["integration"], timings["planning"],
        )


class Data:
    """Loads and summarizes a benchmark log directory."""

    def __init__(self, logdir: Path):
        self.logdir = Path(logdir)
        self.rounds = pd.read_csv(self.logdir / "rounds.csv")
        self.grasps = pd.read_csv(self.logdir / "grasps.csv")

    def num_rounds(self) -> int:
        return len(self.rounds.index)

    def num_grasps(self) -> int:
        return len(self.grasps.index)

    def success_rate(self) -> float:
        return self.grasps["label"].mean() * 100

    def percent_cleared(self) -> float:
        df = (
            self.grasps[["round_id", "label"]]
            .groupby("round_id")
            .sum()
            .rename(columns={"label": "cleared_count"})
            .merge(self.rounds, on="round_id")
        )
        return df["cleared_count"].sum() / df["object_count"].sum() * 100

    def avg_planning_time(self) -> float:
        return self.grasps["planning_time"].mean()

    def read_grasp(self, i: int):
        scene_id, grasp, label = io.read_grasp(self.grasps, i)
        score = self.grasps.loc[i, "score"]
        scene_data = np.load(self.logdir / "scenes" / (scene_id + ".npz"))
        return scene_data["points"], grasp, score, label
