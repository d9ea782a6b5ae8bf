"""End-to-end L5 data chain on a miniature fixture world (VERDICT item 3):

    generate_data_parallel (fake-pybullet sim, real renders + TSDF fusion)
      -> clean_balance_data
      -> construct_dataset_parallel (depth re-integration into 40^3 TSDFs)
      -> save_occ_data_parallel (mesh containment occupancy shards)
      -> scripts/train.py main() for one epoch
      -> plan grasps from the trained checkpoint.

Every script's entry function executes over real files, exercising the whole
reference pipeline (SURVEY.md section 3.4) in one test."""

from types import SimpleNamespace

import numpy as np
import pytest

from tests.conftest import SIM_URDF_ROOT


@pytest.fixture(scope="module")
def chain_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("chain")
    return SimpleNamespace(raw=root / "raw", dataset=root / "dataset", runs=root / "runs")


def test_full_chain(fake_pb, chain_dirs):
    raw, dataset = chain_dirs.raw, chain_dirs.dataset

    # --- 1. generate raw grasp trials ------------------------------------------------
    from scripts.generate_data_parallel import worker

    worker(
        SimpleNamespace(
            root=raw, scene="packed", object_set="cubes",
            num_grasps=24, grasps_per_scene=6, num_proc=1,
            save_scene=True, random=False, sim_gui=False,
            seed=11, urdf_root=str(SIM_URDF_ROOT),
        ),
        rank=0,
    )
    assert (raw / "setup.json").exists()
    assert (raw / "grasps.csv").exists()
    scenes = list((raw / "scenes").glob("*.npz"))
    assert len(scenes) >= 1
    assert list((raw / "mesh_pose_list").glob("*.npz"))

    from giga_tpu.core import io

    df = io.read_df(raw)
    assert len(df) >= 12
    assert {"scene_id", "qx", "qy", "qz", "qw", "x", "y", "z", "width", "label"} <= set(df.columns)
    assert (df["label"] == 1).any(), "fixture scenes must yield positive grasps"

    # --- 2. clean + balance -----------------------------------------------------------
    from scripts.clean_balance_data import main as clean_main

    clean_main(SimpleNamespace(root=raw))
    df = io.read_df(raw)
    n_pos = int((df["label"] == 1).sum())
    n_neg = int((df["label"] == 0).sum())
    assert n_pos >= 1 and n_neg <= n_pos

    # --- 3. construct the training dataset --------------------------------------------
    from scripts.construct_dataset_parallel import main as construct_main

    construct_main(
        SimpleNamespace(raw=raw, dataset=dataset, num_proc=1,
                        single_view=False, add_noise="")
    )
    df2 = io.read_df(dataset)
    assert len(df2) == len(df)
    grids = list((dataset / "scenes").glob("*.npz"))
    assert len(grids) >= 1
    grid = io.read_voxel_grid(dataset, grids[0].stem)
    assert grid.shape == (1, 40, 40, 40) and grid.max() > 0

    # --- 4. occupancy ground-truth shards ----------------------------------------------
    from scripts.save_occ_data_parallel import main as occ_main

    occ_main(
        SimpleNamespace(raw=str(raw), num_point_per_file=128, num_file=2,
                        num_proc=1, uniform=False)
    )
    occ_dirs = list((raw / "occ").iterdir())
    assert len(occ_dirs) >= 1
    shard = np.load(next(occ_dirs[0].glob("*.npz")))
    assert shard["points"].shape == (128, 3)
    assert shard["occ"].shape == (128,)
    assert shard["occ"].any(), "objects in the scene must produce occupied samples"

    # --- 5. train one epoch through the script entry point ------------------------------
    from scripts.train import main as train_main

    savedir = chain_dirs.runs / "giga"
    train_main(
        SimpleNamespace(
            net="giga", dataset=dataset, dataset_raw=raw, logdir=chain_dirs.runs,
            savedir=str(savedir), epochs=1, batch_size=2, lr=2e-4, val_split=0.25,
            augment=False, load_path="", seed=0, dp=False, orbax=False, workers=0,
        )
    )
    ckpts = list(savedir.glob("*.msgpack"))
    assert ckpts, f"no checkpoint written in {savedir}"
    assert (savedir / "history.jsonl").exists()

    # --- 6. plan with the trained checkpoint --------------------------------------------
    from giga_tpu.inference.planner import GIGAPlanner, State
    from giga_tpu.models.registry import load_network

    net, cfg, params = load_network(sorted(ckpts)[-1], "giga")
    planner = GIGAPlanner(net=net, model_cfg=cfg, params=params,
                          force_detection=True, best=True,
                          rng=np.random.RandomState(0))
    grasps, scores, toc = planner(State(tsdf=grid))
    assert isinstance(grasps, list)
    assert toc > 0
