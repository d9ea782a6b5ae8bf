"""Train GIGA on a pre-built synthetic corpus with the device-resident
pipeline, periodically challenge the incumbent with the grasp oracle, and
keep the best checkpoint.

The round-3 quality push (VERDICT r2 #3): scale the corpus instead of
re-rolling hyperparameters (round-2 finding: training variance dominates).
data/corpus has grown 40 -> 480 -> 960 -> 1920 -> 3840 scenes x 160
oracle-labeled grasps across rounds; training uses exact k*90-degree
z-rotation augmentation and evaluates wide (>=32 scenes, multiple seeds)
instead of the noisy 8-scene single-seed round-2 protocol.

Each train step ships only index arrays to the device (train/corpus.py);
the corpus itself is committed to HBM once. On this tunnel that's the
difference between ~200 ms/step of transfer and a compute-bound step.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from giga_tpu.models.registry import get_network, save_params
from giga_tpu.train.corpus import (
    CorpusSampler,
    assemble_batch,
    device_corpus,
    load_corpus,
)
from giga_tpu.train.trainer import create_train_state, make_train_step


def oracle_eval(params, n_scenes, seed, top_k=5, qual_th=0.8, net_name="giga"):
    """Fresh-scene GSR via the geometric oracle (eval_synthetic_gsr protocol)."""
    from giga_tpu.inference.planner import GIGAPlanner, State
    from giga_tpu.utils.synthetic import mesh_to_tsdf, random_scene
    from giga_tpu.utils.synthetic_grasps import evaluate_grasp

    net, cfg = get_network(net_name)
    # GIGAPlanner device_puts the host snapshot once (no re-upload per call)
    planner = GIGAPlanner(
        net=net, model_cfg=cfg, params=params, best=True, force_detection=True,
        low_th=0.1, qual_th=qual_th, rng=np.random.RandomState(0),
    )
    rng = np.random.RandomState(seed)
    labels = []
    for _ in range(n_scenes):
        mesh = random_scene(rng, 0.3)
        tsdf = mesh_to_tsdf(mesh, 0.3, 40, rng=rng)
        grasps, _, _ = planner(State(tsdf=tsdf[None]))
        surf, _ = mesh.sample_surface(20000, rng=rng)
        labels += [evaluate_grasp(mesh, surf, g.pose, rng)[0] for g in grasps[:top_k]]
    return 100.0 * float(np.mean(labels)) if labels else 0.0


def main(args):
    import json

    corpus_np = load_corpus(args.corpus)
    n_scenes = corpus_np["tsdf"].shape[0]
    print(f"corpus: {n_scenes} scenes, "
          f"{corpus_np['grasp_label'].shape[1]} grasps/scene, "
          f"positive fraction {corpus_np['grasp_label'].mean():.3f}", flush=True)

    net, cfg = get_network(args.net)
    is_geo = getattr(cfg, "tsdf_only", False)
    import optax

    lr = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    state = create_train_state(net, cfg, jax.random.PRNGKey(args.seed), lr=lr,
                               clip_norm=1.0, skip_nonfinite=True)
    dtype = jnp.bfloat16 if args.bf16 else None
    step = make_train_step(net, cfg, dtype=dtype, assemble=assemble_batch)

    # held-out validation split (reference protocol: random 0.9/0.1 split,
    # train_giga.py:128-131; here the TAIL of the shuffled scene index so
    # the split is reproducible from the seed alone)
    perm = np.random.RandomState(args.seed + 7).permutation(n_scenes)
    n_val = int(round(args.val_frac * n_scenes))
    train_idx, val_idx = perm[: n_scenes - n_val], perm[n_scenes - n_val:]

    corpus = device_corpus(corpus_np)
    sampler = CorpusSampler(corpus_np, train_idx, args.batch,
                            args.batch_occ, seed=args.seed,
                            augment=not args.no_augment)

    history_path = None
    val_batches, eval_step = [], None
    if n_val > 0:
        from giga_tpu.train.trainer import make_eval_step, summarize_metrics

        eval_step = make_eval_step(net, cfg)
        assemble = jax.jit(assemble_batch)
        # fixed deterministic val batches (no augmentation, fixed occ subset)
        vs = CorpusSampler(corpus_np, val_idx, args.batch, args.batch_occ,
                           seed=12345, augment=False)
        for _ in range(max(1, (2 * n_val) // args.batch)):
            val_batches.append({k: jnp.asarray(v) for k, v in vs().items()})
        history_path = Path(args.out).with_suffix(".history.jsonl") if args.out else None
        if history_path is not None:
            history_path.parent.mkdir(parents=True, exist_ok=True)
            history_path.write_text("")  # fresh run

    def run_val(params, it):
        accum = [
            {k: float(v) for k, v in
             jax.device_get(eval_step(params, assemble(corpus, sel))).items()}
            for sel in val_batches
        ]
        summary = summarize_metrics(accum)
        print(
            f"step {it}: val loss {summary.get('loss_all', float('nan')):.4f} "
            f"acc {summary.get('accuracy', 0):.3f} "
            f"prec {summary.get('precision', 0):.3f} "
            f"rec {summary.get('recall', 0):.3f} "
            f"({len(val_batches)} batches x {args.batch})", flush=True)
        if history_path is not None:
            with history_path.open("a") as f:
                f.write(json.dumps({"step": it, **summary}) + "\n")
        return summary

    # EMA of params: the oracle-GSR trajectory oscillates strongly between
    # checkpoints (round-3 runs: 16-47% swings at adjacent evals); a slow
    # weight average is a much flatter, usually-better candidate
    ema = None
    if args.ema > 0:

        @jax.jit
        def ema_update(e, p):
            return jax.tree.map(
                lambda a, b: args.ema * a + (1.0 - args.ema) * b, e, p
            )

    t0 = time.time()
    best = (-1.0, None, "")  # (gsr, params, tag)
    # best candidate from the EMA trajectory alone, saved separately so the
    # EMA-vs-raw comparison has its own wide-evalable artifact (VERDICT r4
    # #3: the one built-but-unreported variance-reduction lever)
    best_ema = (-1.0, None)
    ema_out = (str(Path(args.out).with_suffix(".ema.msgpack"))
               if args.out and args.ema > 0 else None)
    pool = []  # all scored eval-point candidates (gsr, params_host, tag)
    for it in range(1, args.steps + 1):
        sel = {k: jnp.asarray(v) for k, v in sampler().items()}
        state, terms = step(state, corpus, sel)
        if args.ema > 0:
            # first assignment must COPY: the step donates its state arg, so
            # aliasing state.params would leave ema pointing at buffers the
            # next step deletes (CLAUDE.md: thread donated state linearly)
            ema = (jax.tree.map(jnp.copy, state.params) if ema is None
                   else ema_update(ema, state.params))
        if it % args.log_every == 0 or it == args.steps:
            loss = float(jax.device_get(terms["loss_all"]))
            print(f"step {it}: loss {loss:.4f} "
                  f"({(time.time() - t0) / it * 1e3:.0f} ms/step avg)", flush=True)
        if eval_step is not None and (it % args.eval_every == 0 or it == args.steps):
            summary = run_val(state.params, it)
            if is_geo:
                # GIGA-Geo selection: best held-out occ accuracy (the
                # reference's train_giga_geo best-checkpoint criterion)
                cands = [("", state.params)]
                if ema is not None:
                    cands.append(("ema ", ema))
                for tag, params in cands:
                    acc = summary["accuracy"] if tag == "" else None
                    if acc is None:
                        accum = [
                            {k: float(v) for k, v in jax.device_get(
                                eval_step(params, assemble(corpus, sel))).items()}
                            for sel in val_batches
                        ]
                        acc = summarize_metrics(accum)["accuracy"]
                    if acc > best[0]:
                        best = (acc, jax.device_get(params), tag)
                        if args.out:
                            save_params(best[1], args.out)
                        print(f"step {it}: {tag}val occ accuracy {acc:.4f} *best*",
                              flush=True)
        if not is_geo and (it % args.eval_every == 0 or it == args.steps):
            # multi-seed selection: the 12-scene single-seed protocol was
            # noisy enough to pick checkpoints that lose 20 GSR points on a
            # wide eval (round-3 finding) — average over independent seeds
            seeds = [args.eval_seed + 97 * k for k in range(args.eval_reps)]
            cands = [("", jax.device_get(state.params))]
            if ema is not None:
                cands.append(("ema ", jax.device_get(ema)))
            for tag, params in cands:
                per_seed = [oracle_eval(params, args.eval_scenes, s,
                                        net_name=args.net)
                            for s in seeds]
                gsr = float(np.mean(per_seed))
                pool.append((gsr, params, f"{tag}step-{it}"))
                mark = ""
                if gsr > best[0]:
                    best = (gsr, params, tag)
                    mark = " *best*"
                    if args.out:
                        save_params(params, args.out)
                if tag == "ema " and gsr > best_ema[0]:
                    best_ema = (gsr, params)
                    if ema_out:
                        save_params(params, ema_out)
                detail = "/".join(f"{g:.0f}" for g in per_seed)
                print(f"step {it}: {tag}oracle GSR {gsr:.1f}% [{detail}] "
                      f"(top-5 x {args.eval_scenes} scenes x {len(seeds)} "
                      f"seeds){mark}", flush=True)

    if not is_geo and args.soup_k > 1 and len(pool) > 1:
        # Greedy checkpoint soup along the trajectory: the oracle-GSR
        # trajectory oscillates 30+ points between adjacent evals (round-4
        # finding) while val accuracy is flat, so an average over several
        # good checkpoints is a flatter, often-better candidate than any
        # single step (see giga_tpu/train/soup.py).
        from giga_tpu.train.soup import greedy_soup

        seeds = [args.eval_seed + 97 * k for k in range(args.eval_reps)]

        def score(params):
            return float(np.mean(
                [oracle_eval(params, args.eval_scenes, s, net_name=args.net)
                 for s in seeds]))

        soup_gsr, soup, members = greedy_soup(
            pool, score, k=args.soup_k,
            verbose=lambda m: print(m, flush=True))
        n_in = len(members)
        if n_in > 1 and soup_gsr >= best[0]:
            best = (soup_gsr, soup, f"soup[{','.join(members)}]")
            if args.out:
                save_params(soup, args.out)
            print(f"soup of {n_in} checkpoints selected: {soup_gsr:.1f}% "
                  f"[{', '.join(members)}]", flush=True)
    score = (f"val occ accuracy {best[0]:.4f}" if is_geo
             else f"GSR {best[0]:.1f}%")
    print(f"trained {args.steps} steps in {(time.time() - t0) / 60:.1f} min; "
          f"best in-training {score} {best[2]}")
    if best_ema[1] is not None:
        print(f"best EMA-trajectory candidate: GSR {best_ema[0]:.1f}% "
              f"(saved to {ema_out})")
    if args.out and best[1] is not None:
        save_params(best[1], args.out)
        print(f"saved best params to {args.out}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--net", type=str, default="giga",
                   help="giga (grasp+occ) or giga_geo (occupancy-only; "
                        "selection by held-out occ accuracy)")
    p.add_argument("--corpus", type=str, default="data/corpus")
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--batch-occ", type=int, default=1024)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--eval-every", type=int, default=1500)
    p.add_argument("--eval-scenes", type=int, default=12)
    p.add_argument("--eval-seed", type=int, default=1000)
    p.add_argument("--eval-reps", type=int, default=2,
                   help="independent eval seeds averaged for selection")
    p.add_argument("--ema", type=float, default=0.999,
                   help="params EMA decay; 0 disables")
    p.add_argument("--soup-k", type=int, default=4,
                   help="greedy-soup pool size over eval-point checkpoints "
                        "(giga only; <=1 disables)")
    p.add_argument("--val-frac", type=float, default=0.05,
                   help="held-out scene fraction for val loss/acc curves "
                        "(history written next to --out); 0 disables")
    p.add_argument("--out", type=str, default="checkpoints/corpus_giga.msgpack")
    raise SystemExit(main(p.parse_args()))
