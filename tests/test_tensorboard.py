"""TensorBoard event-file writer: round-trip + real-tensorboard format check.

The reference logs curves via torch.utils.tensorboard
(train_giga.py:238-245); giga_tpu writes the identical on-disk format with a
dependency-free encoder (giga_tpu/utils/tensorboard.py). The format test
reads our files back through the actual tensorboard package installed here.
"""

import numpy as np
import pytest

from giga_tpu.utils.tensorboard import SummaryWriter, crc32c, read_events


def test_crc32c_known_vectors():
    # public test vectors for CRC-32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def _write_log(tmp_path):
    w = SummaryWriter(tmp_path)
    for step in range(1, 4):
        w.add_scalar("train/loss", 1.0 / step, step)
        w.add_scalars({"val/loss": 2.0 / step, "val/accuracy": 0.25 * step}, step)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    return files[0]


def test_roundtrip_own_reader(tmp_path):
    path = _write_log(tmp_path)
    events = read_events(path)
    # 3 add_scalar + 3 add_scalars records (file_version record filtered out)
    assert len(events) == 6
    step, scalars = events[0]
    assert step == 1 and scalars == {"train/loss": pytest.approx(1.0)}
    step, scalars = events[-1]
    assert step == 3
    assert scalars["val/accuracy"] == pytest.approx(0.75)


def test_readable_by_real_tensorboard(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    path = _write_log(tmp_path)
    acc = ea_mod.EventAccumulator(str(path))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"train/loss", "val/loss", "val/accuracy"}
    losses = acc.Scalars("train/loss")
    assert [e.step for e in losses] == [1, 2, 3]
    np.testing.assert_allclose(
        [e.value for e in losses], [1.0, 0.5, 1.0 / 3.0], rtol=1e-6
    )


def test_trainer_writes_event_file(tmp_path):
    """Trainer.fit with a logdir emits a tensorboard event file with the
    per-epoch train/val scalars."""
    import jax

    from giga_tpu.core.config import TrainConfig
    from giga_tpu.models.registry import get_network
    from giga_tpu.train.trainer import Trainer, create_train_state

    net, cfg = get_network("giga_geo")
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), tsdf_shape=(1, 8, 8, 8))
    rng = np.random.RandomState(0)
    batch = {
        "tsdf": rng.rand(2, 8, 8, 8).astype(np.float32),
        "pos": rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32),
        "pos_occ": rng.uniform(-0.4, 0.4, (2, 4, 3)).astype(np.float32),
        "occ": rng.randint(0, 2, (2, 4)).astype(np.float32),
    }
    trainer = Trainer(net, cfg, TrainConfig(), logdir=tmp_path)
    state, history = trainer.fit(state, [batch], [batch], epochs=2, log=lambda *_: None)
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    steps = sorted({s for s, _ in events})
    assert steps == [1, 2]
    tags = {t for _, sc in events for t in sc}
    assert any(t.startswith("train/") for t in tags)
    assert any(t.startswith("val/") for t in tags)
