"""Model factory + checkpoint loading (reference: src/vgn/networks.py:10-35).

``get_network(name)`` returns (module, config). ``load_network(path)``
dispatches on file type: ``.pt`` torch checkpoints go through the converter,
everything else is an orbax/msgpack params file. Model type is inferred from
the filename pattern ``{prefix}_{type}_...`` like the reference when not
given explicitly.
"""

from __future__ import annotations

from pathlib import Path

from giga_tpu.core.config import VGNConfig, get_config
from giga_tpu.models.conv_onet import GIGANet
from giga_tpu.models.vgn import VGNNet


def get_network(name: str):
    """Build (flax module, config) for a preset name."""
    cfg = get_config(name)
    if isinstance(cfg, VGNConfig):
        return VGNNet(cfg), cfg
    return GIGANet(cfg), cfg


def infer_model_type(path: Path) -> str:
    """Reference convention: model name is stem tokens [1:-1] (networks.py:29)."""
    return "_".join(Path(path).stem.split("_")[1:-1])


def load_network(path, model_type: str | None = None):
    """Load a checkpoint -> (module, config, params).

    Accepts the reference's torch ``.pt`` state_dicts (converted on the fly)
    or native msgpack files written by ``save_params``.
    """
    path = Path(path)
    if model_type is None:
        model_type = infer_model_type(path)
    net, cfg = get_network(model_type)
    if path.suffix == ".pt":
        from giga_tpu.models.torch_convert import convert_torch_checkpoint

        params = convert_torch_checkpoint(path, cfg)
    else:
        params = load_params(path)
    return net, cfg, params


def save_params(params, path) -> None:
    from flax.serialization import msgpack_serialize
    from flax.core import unfreeze

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    import jax

    host_params = jax.device_get(unfreeze(params))
    path.write_bytes(msgpack_serialize(host_params))


def load_params(path):
    from flax.serialization import msgpack_restore

    return msgpack_restore(Path(path).read_bytes())
