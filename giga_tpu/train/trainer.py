"""Train step + training loop (reference: scripts/train_giga*.py).

Optimizer: Adam(lr 2e-4), batch 32, 10 epochs by default. The train step is
one jitted program with explicit shardings: params/opt-state replicated over
the ``dp`` mesh axis, batch sharded — XLA inserts the psum gradient
reduction over ICI. Checkpointing via orbax (params + opt state + epoch),
plus 'best by validation accuracy' tracking like the reference's ignite
ModelCheckpoint (train_giga.py:97-117).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from giga_tpu.core.config import GIGAConfig, TrainConfig
from giga_tpu.train.loss import classification_metrics, giga_loss, occ_only_loss


class TrainState(train_state.TrainState):
    pass


def create_train_state(net, cfg, rng, lr: float = 2e-4, tsdf_shape=(1, 40, 40, 40),
                       clip_norm: float | None = None,
                       skip_nonfinite: bool = False):
    """``clip_norm`` prepends global-norm gradient clipping to Adam — off by
    default (the reference trains with plain Adam), but worth 1.0 for small
    synthetic datasets where a loss spike can NaN the run. ``skip_nonfinite``
    wraps the optimizer in ``optax.apply_if_finite``: steps with inf/NaN
    gradients are skipped instead of poisoning the params (clipping alone
    cannot save an inf gradient — 0 * inf = NaN inside the clip scale)."""
    tsdf = jnp.zeros(tsdf_shape, jnp.float32)
    p = jnp.zeros((tsdf_shape[0], 1, 3), jnp.float32)
    if not isinstance(cfg, GIGAConfig):  # dense VGN baseline
        params = net.init(rng, tsdf)
    elif cfg.tsdf_only:
        params = net.init(rng, tsdf, None, p)
    else:
        params = net.init(rng, tsdf, p, p if cfg.decoder_tsdf else None)
    tx = optax.adam(lr)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return TrainState.create(apply_fn=net.apply, params=params, tx=tx)


def _cast_net_inputs(params, batch, dtype):
    """Mixed precision: cast params and NETWORK inputs to ``dtype``; targets
    (labels/rotations/widths/occ) stay fp32 so the loss reduces in fp32."""
    params = jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    batch = dict(batch)
    for k in ("tsdf", "pos", "pos_occ"):
        if batch.get(k) is not None:
            batch[k] = batch[k].astype(dtype)
    return params, batch


def _out_f32(out):
    return jax.tree.map(lambda a: a.astype(jnp.float32), out)


def make_loss_fn(net, cfg, dtype=None) -> Callable:
    """Returns loss_fn(params, batch) -> (loss, (terms, outputs)).

    ``dtype=jnp.bfloat16``: the forward pass runs in bf16 but the head
    outputs are cast back to fp32 BEFORE any loss math — bf16's 8 mantissa
    bits saturate the probability-space BCE (a prob within ~2^-9 of 1 rounds
    to exactly 1, clamping log1p to -100 with zero gradient), so losses and
    targets must stay fp32.
    """
    if not isinstance(cfg, GIGAConfig):
        return make_vgn_loss_fn(net, dtype)

    def loss_fn(params, batch):
        if dtype is not None:
            params, batch = _cast_net_inputs(params, batch, dtype)
        p = batch["pos"][:, None, :]  # (B, 1, 3)
        p_occ = batch.get("pos_occ")
        if cfg.tsdf_only:
            out = net.apply(params, batch["tsdf"], None, p_occ)
            out = _out_f32({"occ": out["occ"]})
            loss, terms = occ_only_loss(out, batch)
        else:
            out = net.apply(params, batch["tsdf"], p, p_occ if cfg.decoder_tsdf else None)
            out = {k: (v[:, 0] if k in ("qual", "width") else v) for k, v in out.items()}
            out["rot"] = out["rot"][:, 0]
            out = _out_f32(out)
            loss, terms = giga_loss(out, batch)
        return loss, (terms, out)

    return loss_fn


def make_vgn_loss_fn(net, dtype=None) -> Callable:
    """Dense VGN objective (reference: scripts/train_vgn.py:150-188): predict
    full volumes, select the labeled voxel, same composite loss but with
    unscaled width MSE (widths are in voxel units)."""
    from giga_tpu.train.loss import binary_cross_entropy, rot_loss

    def loss_fn(params, batch):
        if dtype is not None:
            params, batch = _cast_net_inputs(params, batch, dtype)
        qual, rot, width = net.apply(params, batch["tsdf"])
        qual, rot, width = (qual.astype(jnp.float32), rot.astype(jnp.float32),
                            width.astype(jnp.float32))
        idx = batch["index"]
        b = jnp.arange(qual.shape[0])
        q = qual[b, idx[:, 0], idx[:, 1], idx[:, 2]]
        r = rot[b, idx[:, 0], idx[:, 1], idx[:, 2]]
        w = width[b, idx[:, 0], idx[:, 1], idx[:, 2]]
        label = batch["label"]
        l_qual = binary_cross_entropy(q, label)
        l_rot = rot_loss(r, batch["rotations"])
        l_width = (w - batch["width"]) ** 2
        loss = (l_qual + label * (l_rot + 0.01 * l_width)).mean()
        terms = {
            "loss_qual": l_qual.mean(),
            "loss_rot": l_rot.mean(),
            "loss_width": l_width.mean(),
            "loss_all": loss,
        }
        return loss, (terms, {"qual": q, "rot": r, "width": w})

    return loss_fn


def _is_geo(cfg) -> bool:
    return isinstance(cfg, GIGAConfig) and cfg.tsdf_only


def _step_metrics(cfg, out, batch) -> dict:
    """Classification metrics: qual head for affordance models, occupancy
    accuracy for the geometry-only model (reference train_giga_geo selects
    the best checkpoint by occ_accuracy)."""
    if _is_geo(cfg):
        occ_prob = jax.nn.sigmoid(out["occ"])
        return classification_metrics(occ_prob.reshape(-1), batch["occ"].reshape(-1))
    return classification_metrics(out["qual"], batch["label"])


def _with_sampler(net, cfg, sampler):
    """Rebuild ``net`` with ``DecoderConfig.sampler = sampler``.

    Plane sampling is paramless, so params/opt-states are interchangeable
    across samplers — only the traced program changes. No-op for non-GIGA
    configs, ``sampler=None``, or when the cfg already matches."""
    if sampler is None or not isinstance(cfg, GIGAConfig):
        return net
    if getattr(cfg.decoder, "sampler", "gather") == sampler:
        return net
    cfg2 = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, sampler=sampler))
    return type(net)(cfg2)


def make_train_step(net, cfg, mesh=None, axis: str = "dp", dtype=None,
                    assemble=None, sampler: Optional[str] = "mm"):
    """Jitted SGD step. With a mesh, batch sharded / state replicated.

    ``sampler`` overrides the decoder's arbitrary-point plane sampling for
    the TRAINING program only (inference keeps each preset's shipped
    sampler). Training queries are arbitrary points (1 grasp + n_occ
    occupancy samples, reference train_giga.py:142-159), where the default
    'gather' sampler pays 4 row-gathers/point forward and — worse — a
    serialized scatter-add into the feature planes backward. 'mm'
    (ops/sampling.py::sample_planes_concat_mm) replaces both with dense
    MXU matmuls: measured on v5e at B=32/N=2048, the bf16 step drops
    23.2 -> 10.7 ms (2.16x). Numerics: the fp32 step pins HIGHEST matmuls,
    where mm matches gather to ~1e-6 (tests/test_ops.py); the bf16 step is
    the approximate path by contract. Pass ``sampler=None`` to keep the
    cfg's own sampler (exact-gather parity runs, A/Bs).

    ``dtype=jnp.bfloat16`` selects mixed precision: master params, optimizer
    state, and the gradient update stay fp32; the forward/backward pass runs
    with bf16-cast params and inputs (the MXU's native precision). Losses are
    reduced in fp32. Default (None) pins fp32-highest matmuls for parity with
    the torch reference's training numerics.

    ``assemble``: optional jit-traceable ``(corpus, sel) -> batch`` hook. When
    given, the returned step has signature ``step(state, corpus, sel)`` and
    batch gather/augmentation runs ON DEVICE inside the same program (the
    device-resident corpus pipeline, train/corpus.py) — the host ships only
    the tiny ``sel`` index arrays per step.
    """
    loss_fn = make_loss_fn(_with_sampler(net, cfg, sampler), cfg, dtype=dtype)

    def step(state: TrainState, batch):
        if dtype is None:
            # fp32 matmul passes for parity with the torch reference
            with jax.default_matmul_precision("highest"):
                (loss, (terms, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, batch)
        else:
            # loss_fn casts params + network inputs to dtype internally and
            # returns fp32 losses; grads of the cast accumulate back into
            # the fp32 master leaves
            (loss, (terms, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch)
        state = state.apply_gradients(grads=grads)
        terms = {**terms, **_step_metrics(cfg, out, batch)}
        return state, terms

    if assemble is not None:
        def corpus_step(state, corpus, sel):
            return step(state, assemble(corpus, sel))
        if mesh is None:
            return jax.jit(corpus_step, donate_argnums=0)
        repl = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P(axis))
        # corpus replicated (every device holds the dataset; each gathers its
        # own sel shard), sel batch-sharded over dp
        return jax.jit(
            corpus_step,
            donate_argnums=0,
            in_shardings=(repl, repl, sharded),
            out_shardings=(repl, repl),
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        donate_argnums=0,
        in_shardings=(repl, sharded),
        out_shardings=(repl, repl),
    )


def make_eval_step(net, cfg, mesh=None, axis: str = "dp",
                   sampler: Optional[str] = "mm"):
    """Jitted metrics pass (HIGHEST-pinned fp32). ``sampler`` as in
    make_train_step — the eval pin makes 'mm' match 'gather' to ~1e-6."""
    loss_fn = make_loss_fn(_with_sampler(net, cfg, sampler), cfg)

    def step(params, batch):
        with jax.default_matmul_precision("highest"):
            loss, (terms, out) = loss_fn(params, batch)
        terms = {**terms, **_step_metrics(cfg, out, batch)}
        return terms

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))
    return jax.jit(step, in_shardings=(repl, sharded), out_shardings=repl)


def summarize_metrics(accum: list[dict]) -> dict:
    """Average loss terms; derive accuracy/precision/recall from counts.

    Losses are averaged per SAMPLE when batch counts are available (each
    batch's mean loss weighted by its "n"); a plain per-batch mean would let
    a short last batch skew the epoch summary. Count-derived metrics are
    exact either way.
    """
    if not accum:
        return {}
    keys = accum[0].keys()
    tot = {k: float(np.sum([a[k] for a in accum])) for k in keys}
    n_batches = len(accum)
    if "n" in tot and tot["n"] > 0:
        out = {
            k: float(np.sum([a[k] * a["n"] for a in accum])) / tot["n"]
            for k in keys if k.startswith("loss")
        }
    else:
        out = {k: tot[k] / n_batches for k in keys if k.startswith("loss")}
    if "n" in tot and tot["n"] > 0:
        tp, fp, fn = tot.get("tp", 0), tot.get("fp", 0), tot.get("fn", 0)
        out["accuracy"] = tot["correct"] / tot["n"]
        out["precision"] = tp / max(tp + fp, 1e-9)
        out["recall"] = tp / max(tp + fn, 1e-9)
    return out


@dataclasses.dataclass
class Trainer:
    """Epoch loop with validation, tensorboard-style CSV logging, and
    last+best checkpointing."""

    net: object
    model_cfg: GIGAConfig
    train_cfg: TrainConfig
    mesh: object = None
    logdir: Optional[Path] = None
    use_orbax: bool = False
    dtype: object = None  # jnp.bfloat16 -> mixed-precision train step

    def __post_init__(self):
        # eval stays fp32 so validation metrics are comparable across runs
        self.train_step = make_train_step(self.net, self.model_cfg, self.mesh,
                                          dtype=self.dtype)
        self.eval_step = make_eval_step(self.net, self.model_cfg, self.mesh)
        self.best_score = -np.inf
        self.ckpt_mgr = None
        self.start_epoch = 1
        self.tb_writer = None
        if self.logdir is not None:
            self.logdir = Path(self.logdir)
            self.logdir.mkdir(parents=True, exist_ok=True)
            from giga_tpu.utils.tensorboard import SummaryWriter

            self.tb_writer = SummaryWriter(self.logdir)
            if self.use_orbax:
                from giga_tpu.train.checkpoint import CheckpointManager

                self.ckpt_mgr = CheckpointManager(self.logdir / "orbax")

    def try_resume(self, state):
        """Resume from the latest orbax checkpoint (params+opt state+epoch)."""
        if self.ckpt_mgr is None:
            return state
        restored = self.ckpt_mgr.restore(state)
        if restored is None:
            return state
        state, metrics, epoch = restored
        self.start_epoch = epoch + 1
        self.best_score = metrics.get("best_score", -np.inf)
        print(f"resumed from epoch {epoch}")
        return state

    def _put(self, batch):
        if self.mesh is None:
            return batch
        from giga_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def fit(self, state: TrainState, train_loader, val_loader, epochs: int, log=print):
        state = self.try_resume(state)
        history = self._load_history()
        for epoch in range(self.start_epoch, epochs + 1):
            t0 = time.time()
            accum = []
            for batch in train_loader:
                state, terms = self.train_step(state, self._put(batch))
                # keep terms on device: a per-step host fetch would
                # serialize every step against the link round-trip
                # (~25 ms/fetch on the tunnel); ONE fetch per epoch below
                accum.append(terms)
            train_metrics = summarize_metrics(jax.device_get(accum))

            accum = []
            for batch in val_loader:
                accum.append(self.eval_step(state.params, self._put(batch)))
            val_metrics = summarize_metrics(jax.device_get(accum))

            dt = time.time() - t0
            log(
                f"epoch {epoch} ({dt:.1f}s) "
                + " ".join(f"{k}={v:.4f}" for k, v in train_metrics.items())
                + " | val "
                + " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items())
            )
            history.append({"epoch": epoch, "train": train_metrics, "val": val_metrics})

            if self.logdir is not None:
                self._log_csv(history)
                self._log_tensorboard(epoch, train_metrics, val_metrics)
                self._checkpoint(state, val_metrics, epoch)
        if self.tb_writer is not None:
            self.tb_writer.close()  # guards double-close; releases the event file
        return state, history

    def _score(self, val_metrics):
        key = "accuracy" if "accuracy" in val_metrics else "loss_all"
        v = val_metrics.get(key, -np.inf)
        return v if key == "accuracy" else -v

    def _checkpoint(self, state, val_metrics, epoch: int = 0):
        from giga_tpu.models.registry import save_params

        name = getattr(self.model_cfg, "name", "model")
        save_params(state.params, self.logdir / f"{name}_last.msgpack")
        score = self._score(val_metrics)
        if score > self.best_score:
            self.best_score = score
            save_params(state.params, self.logdir / f"{name}_best.msgpack")
        if self.ckpt_mgr is not None:
            self.ckpt_mgr.save(
                epoch, state, {**val_metrics, "best_score": self.best_score}
            )

    def _log_tensorboard(self, epoch, train_metrics, val_metrics):
        """TensorBoard scalar curves, same tags as the reference's
        SummaryWriter usage (reference scripts/train_giga.py:238-245)."""
        self.tb_writer.add_scalars(
            {f"train/{k}": v for k, v in train_metrics.items()}, epoch
        )
        self.tb_writer.add_scalars(
            {f"val/{k}": v for k, v in val_metrics.items()}, epoch
        )

    def _load_history(self):
        """Pre-resume epoch rows, so a resumed run's history.jsonl keeps its
        earlier curve instead of being truncated to post-resume epochs."""
        import json

        if self.logdir is None or self.start_epoch <= 1:
            return []
        path = self.logdir / "history.jsonl"
        if not path.exists():
            return []
        rows = [json.loads(line) for line in path.open() if line.strip()]
        return [r for r in rows if r.get("epoch", 0) < self.start_epoch]

    def _log_csv(self, history):
        import json

        with (self.logdir / "history.jsonl").open("w") as f:
            for row in history:
                f.write(json.dumps(row) + "\n")
