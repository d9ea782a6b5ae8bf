"""Training CLI for all presets (reference: scripts/train_{giga,giga_aff,
giga_geo,vgn}.py unified).

Defaults match the reference: Adam lr 2e-4, batch 32, 10 epochs, 0.9/0.1
split. Data parallelism over all local devices via --dp.
"""

import argparse
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from giga_tpu.models.registry import get_network
from giga_tpu.train.data import create_train_val_loaders
from giga_tpu.train.trainer import Trainer, create_train_state
from giga_tpu.core.config import TrainConfig


def main(args):
    net, model_cfg = get_network(args.net)
    train_cfg = TrainConfig(
        net=args.net, batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
        val_split=args.val_split, augment=args.augment, seed=args.seed,
    )

    if args.savedir:
        logdir = Path(args.savedir)
    else:
        stamp = datetime.now().strftime("%y-%m-%d-%H-%M")
        name = f"{stamp}_dataset={Path(args.dataset).name},augment={args.augment},net={args.net},batch_size={args.batch_size},lr={args.lr:.0e}"
        logdir = args.logdir / name

    if args.net == "vgn":
        from giga_tpu.train.data import create_vgn_train_val_loaders

        train_loader, val_loader = create_vgn_train_val_loaders(
            args.dataset, args.batch_size, args.val_split, args.augment, seed=args.seed
        )
    else:
        load_occ = args.net != "giga_aff"
        train_loader, val_loader = create_train_val_loaders(
            args.dataset, args.dataset_raw, args.batch_size, args.val_split,
            args.augment, load_occ=load_occ, seed=args.seed,
        )

    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from giga_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        print(f"data parallel over {len(mesh.devices.ravel())} devices")

    clip = getattr(args, "clip_norm", 0.0)
    state = create_train_state(net, model_cfg, jax.random.PRNGKey(args.seed),
                               lr=args.lr, clip_norm=clip if clip > 0 else None)
    if args.load_path:
        from giga_tpu.models.registry import load_network

        _, _, params = load_network(args.load_path, args.net)
        state = state.replace(params=params)
    if mesh is not None:
        from giga_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)

    if args.workers > 0:
        from giga_tpu.train.data import PrefetchLoader

        train_loader = PrefetchLoader(train_loader, num_workers=args.workers)
        val_loader = PrefetchLoader(val_loader, num_workers=args.workers)

    dtype = None
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    trainer = Trainer(net, model_cfg, train_cfg, mesh=mesh, logdir=logdir,
                      use_orbax=args.orbax, dtype=dtype)
    trainer.fit(state, train_loader, val_loader, epochs=args.epochs)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", default="giga",
                        choices=["giga", "giga_aff", "giga_geo", "giga_detach", "vgn"])
    parser.add_argument("--dataset", type=Path, required=True)
    parser.add_argument("--dataset_raw", type=Path, default=None,
                        help="raw root with grasps.csv/occ (unused for --net vgn)")
    parser.add_argument("--logdir", type=Path, default=Path("data/runs"))
    parser.add_argument("--savedir", type=str, default="")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--clip-norm", type=float, default=0.0,
                        help="global-norm gradient clip; 0 (default) = off,"
                             " matching the reference's plain Adam")
    parser.add_argument("--val-split", type=float, default=0.1)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--load-path", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training (bf16 compute, fp32 state)")
    parser.add_argument("--orbax", action="store_true",
                        help="full-state orbax checkpointing with auto-resume")
    parser.add_argument("--workers", type=int, default=4,
                        help="prefetch worker threads (0 = synchronous)")
    main(parser.parse_args())
