"""Import the *actual* reference implementation as a parity oracle.

Round-1 golden tests compared against ``tests/torch_golden.py`` — a torch
replica written by the same author as the JAX port, so a shared misreading
would be invisible.  This module retires that risk: it imports
``/root/reference/src/vgn`` itself (untrusted, read-only — we only execute
its model code under test) after installing minimal shims for dependencies
absent in this environment:

- ``torch_scatter``: real math (scatter_mean / scatter_max via
  ``scatter_add_`` / ``scatter_reduce_``), matching torch_scatter 2.x
  semantics for the reference's call patterns (zero-initialised ``out``,
  index broadcast along the feature axis; empty segments -> 0).
- ``torchvision``, ``trimesh``, ``pyrender``, ``urdfpy``: import-time stubs
  (the reference imports them at module scope but the model/planner paths
  under test never call into them).

Everything exported here is torch/numpy; no JAX.
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_SRC = "/root/reference/src"


# ---------------------------------------------------------------------------
# torch_scatter shim (real math)
# ---------------------------------------------------------------------------

def _broadcast_index(index: torch.Tensor, src: torch.Tensor, dim: int) -> torch.Tensor:
    """torch_scatter.utils.broadcast: expand index to src's shape along all
    dims except ``dim`` (reference call sites pass index (B, 1, N) for src
    (B, C, N), dim=-1)."""
    if dim < 0:
        dim = src.dim() + dim
    if index.dim() == 1:
        for _ in range(dim):
            index = index.unsqueeze(0)
    while index.dim() < src.dim():
        index = index.unsqueeze(-1)
    return index.expand_as(src)


def scatter_sum(src, index, dim=-1, out=None, dim_size=None):
    index = _broadcast_index(index, src, dim)
    if out is None:
        size = list(src.shape)
        if dim_size is not None:
            size[dim if dim >= 0 else src.dim() + dim] = dim_size
        elif index.numel() == 0:
            size[dim if dim >= 0 else src.dim() + dim] = 0
        else:
            size[dim if dim >= 0 else src.dim() + dim] = int(index.max()) + 1
        out = src.new_zeros(size)
    return out.scatter_add_(dim, index, src)


def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    out = scatter_sum(src, index, dim, out, dim_size)
    d = dim if dim >= 0 else out.dim() + dim
    idx = _broadcast_index(index, src, dim)
    count = torch.zeros_like(out).scatter_add_(dim, idx, torch.ones_like(src))
    count = count.clamp_(min=1)
    out /= count
    return out


def scatter_max(src, index, dim=-1, out=None, dim_size=None):
    index = _broadcast_index(index, src, dim)
    if out is None:
        size = list(src.shape)
        d = dim if dim >= 0 else src.dim() + dim
        size[d] = dim_size if dim_size is not None else int(index.max()) + 1
        out = src.new_zeros(size)
    # include_self=False: empty segments keep the zero init (torch_scatter
    # fills untouched max segments with 0 as well)
    out = out.scatter_reduce_(dim, index, src, reduce="amax", include_self=False)
    argmax = torch.zeros_like(out, dtype=torch.long)  # unused by reference paths under test
    return out, argmax


def _install_shims() -> None:
    if "torch_scatter" not in sys.modules:
        m = types.ModuleType("torch_scatter")
        m.scatter_sum = scatter_sum
        m.scatter_add = scatter_sum
        m.scatter_mean = scatter_mean
        m.scatter_max = scatter_max
        sys.modules["torch_scatter"] = m
    for name in ("trimesh", "pyrender", "urdfpy", "nvisii"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.__is_oracle_stub__ = True
                if name == "urdfpy":
                    stub.URDF = type("URDF", (), {})
                if name == "trimesh":
                    stub.Trimesh = type("Trimesh", (), {})
                    stub.Scene = type("Scene", (), {})
                sys.modules[name] = stub
    if "torchvision" not in sys.modules:
        try:
            __import__("torchvision")
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.__is_oracle_stub__ = True
            tr = types.ModuleType("torchvision.transforms")
            tr.Compose = lambda fns: fns
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr


_loaded = {}


def load_reference():
    """Install shims, put the reference on sys.path, import and return the
    modules needed for parity testing."""
    if _loaded:
        return _loaded
    _install_shims()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    # the reference predates numpy 1.24's alias removal (binvox_rw.py uses
    # np.int at import time); restore the aliases around the import only
    import numpy as np

    import warnings

    legacy = {"int": int, "float": float, "bool": bool}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        added = {k for k in legacy if not hasattr(np, k)}
    for k in added:
        setattr(np, k, legacy[k])
    try:
        import vgn.networks as ref_networks  # noqa: E402
        import vgn.detection as ref_detection  # noqa: E402
        import vgn.detection_implicit as ref_detection_implicit  # noqa: E402
    finally:
        for k in added:
            delattr(np, k)

    _loaded.update(
        networks=ref_networks,
        detection=ref_detection,
        detection_implicit=ref_detection_implicit,
    )
    return _loaded


def build_reference_net(name: str, seed: int = 0):
    """Seeded reference network in eval mode + its state_dict."""
    ref = load_reference()
    torch.manual_seed(seed)
    net = ref["networks"].get_network(name).eval()
    return net


def reference_lattice(resolution: int = 40) -> torch.Tensor:
    """The planner query lattice exactly as detection_implicit.py:28-31."""
    lin = torch.linspace(-0.5, 0.5 - 1.0 / resolution, resolution)
    x, y, z = torch.meshgrid(lin, lin, lin, indexing="ij")
    pos = torch.stack((x, y, z), dim=-1).float().unsqueeze(0)
    return pos.view(1, resolution**3, 3)
