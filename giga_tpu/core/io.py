"""Dataset IO, byte-compatible with the reference formats (src/vgn/io.py:12-126).

Formats:
    setup.json            {"size", "intrinsic", "max_opening_width", "finger_depth"}
    scenes/<id>.npz       raw: depth_imgs + extrinsics; processed: 40^3 "grid"
    grasps.csv            scene_id, qx, qy, qz, qw, x, y, z, width, label
    occ/<id>/*.npz        points (float16) + occ (bool) shards
    mesh_pose_list/<id>.npz  per-scene (mesh_path, scale, pose) triples
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

import numpy as np
import pandas as pd

from giga_tpu.core.grasp import Grasp
from giga_tpu.core.transform import Rotation, Transform

GRASP_CSV_COLUMNS = ["scene_id", "qx", "qy", "qz", "qw", "x", "y", "z", "width", "label"]


# --- setup.json ---------------------------------------------------------------------


def write_setup(root: Path, size, intrinsic, max_opening_width, finger_depth) -> None:
    data = {
        "size": size,
        "intrinsic": intrinsic.to_dict(),
        "max_opening_width": max_opening_width,
        "finger_depth": finger_depth,
    }
    write_json(data, root / "setup.json")


def read_setup(root: Path):
    from giga_tpu.core.perception import CameraIntrinsic

    data = read_json(root / "setup.json")
    return (
        data["size"],
        CameraIntrinsic.from_dict(data["intrinsic"]),
        data["max_opening_width"],
        data["finger_depth"],
    )


# --- scene sensor data --------------------------------------------------------------


def write_sensor_data(root: Path, depth_imgs, extrinsics, scene_id: str | None = None) -> str:
    if scene_id is None:
        scene_id = uuid.uuid4().hex
    path = root / "scenes" / (scene_id + ".npz")
    np.savez_compressed(path, depth_imgs=depth_imgs, extrinsics=extrinsics)
    return scene_id


def write_full_sensor_data(root: Path, depth_imgs, extrinsics, scene_id: str | None = None) -> str:
    if scene_id is None:
        scene_id = uuid.uuid4().hex
    path = root / "full_scenes" / (scene_id + ".npz")
    np.savez_compressed(path, depth_imgs=depth_imgs, extrinsics=extrinsics)
    return scene_id


def read_sensor_data(root: Path, scene_id: str):
    data = np.load(root / "scenes" / (scene_id + ".npz"))
    return data["depth_imgs"], data["extrinsics"]


def read_full_sensor_data(root: Path, scene_id: str):
    data = np.load(root / "full_scenes" / (scene_id + ".npz"))
    return data["depth_imgs"], data["extrinsics"]


# --- grasps.csv ---------------------------------------------------------------------


def write_grasp(root: Path, scene_id: str, grasp: Grasp, label) -> None:
    csv_path = root / "grasps.csv"
    if not csv_path.exists():
        create_csv(csv_path, GRASP_CSV_COLUMNS)
    qx, qy, qz, qw = grasp.pose.rotation.as_quat()
    x, y, z = grasp.pose.translation
    append_csv(csv_path, scene_id, qx, qy, qz, qw, x, y, z, grasp.width, int(label))


def read_grasp(df: pd.DataFrame, i: int):
    scene_id = df.loc[i, "scene_id"]
    orientation = Rotation.from_quat(df.loc[i, "qx":"qw"].to_numpy(np.double))
    position = df.loc[i, "x":"z"].to_numpy(np.double)
    width = df.loc[i, "width"]
    label = df.loc[i, "label"]
    return scene_id, Grasp(Transform(orientation, position), width), label


def read_df(root: Path) -> pd.DataFrame:
    return pd.read_csv(root / "grasps.csv")


def write_df(df: pd.DataFrame, root: Path) -> None:
    df.to_csv(root / "grasps.csv", index=False)


# --- voxel grids / point clouds -----------------------------------------------------


def write_voxel_grid(root: Path, scene_id: str, voxel_grid) -> None:
    np.savez_compressed(root / "scenes" / (scene_id + ".npz"), grid=voxel_grid)


def read_voxel_grid(root: Path, scene_id: str) -> np.ndarray:
    return np.load(root / "scenes" / (scene_id + ".npz"))["grid"]


def write_point_cloud(root: Path, scene_id: str, point_cloud, name: str = "point_clouds") -> None:
    np.savez_compressed(root / name / (scene_id + ".npz"), pc=point_cloud)


def read_point_cloud(root: Path, scene_id: str, name: str = "point_clouds") -> np.ndarray:
    return np.load(root / name / (scene_id + ".npz"))["pc"]


# --- json / csv primitives ----------------------------------------------------------


def read_json(path: Path):
    with Path(path).open("r") as f:
        return json.load(f)


def write_json(data, path: Path) -> None:
    with Path(path).open("w") as f:
        json.dump(data, f, indent=4)


def create_csv(path: Path, columns) -> None:
    with Path(path).open("w") as f:
        f.write(",".join(columns) + "\n")


def append_csv(path: Path, *args) -> None:
    with Path(path).open("a") as f:
        f.write(",".join(str(a) for a in args) + "\n")
