"""Device mesh + sharding rules.

The reference has no inference-path parallelism at all and only vestigial
NCCL/Horovod hooks in training code (see SURVEY.md §2.8; reference
``clap/open_clip/loss.py:9-121``, ``clap/training/params.py:358-401``). The
TPU-native replacement is a ``jax.sharding.Mesh`` with:

* ``dp`` — data parallel over batch x candidates (the reference already fuses
  CFG candidates into one batch, ddpm.py:1511-1525, which maps 1:1 onto a
  sharded leading axis); gradients sync via XLA all-reduce over ICI.
* ``tp`` — tensor parallel over attention heads / FF hidden dims for the
  UNet and text encoders (megatron-style column/row splits).

Pipeline/expert/sequence parallelism are intentionally absent: the largest
component (~350M params) fits in one chip's HBM and sequence lengths are
bounded (latent T <= 256, GPT-2 context <= 1024) — see SURVEY.md §5.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """1-D dp mesh by default; dp x tp when ``tp`` divides the device count."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, axis_names=("dp", "tp"))


def _param_spec(path: tuple, leaf) -> P:
    """Megatron-style specs by param-tree path.

    Column-split (shard output features on tp): q/k/v projections, FF in.
    Row-split (shard input features): attention out, FF out.
    Conv kernels: shard output channels for in-convs, input channels for
    out-convs. Everything else replicated.
    """
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    name = ".".join(str(k) for k in keys)
    leafname = keys[-1] if keys else ""
    ndim = getattr(leaf, "ndim", 0)

    def spec_for_linear(col: bool) -> P:
        if leafname == "w" and ndim == 2:
            return P(None, "tp") if col else P("tp", None)
        if leafname == "b" and ndim == 1 and col:
            return P("tp")
        return P()

    if any(s in name for s in (".to_q.", ".to_k.", ".to_v.")) or name.endswith(
        (".to_q.w", ".to_k.w", ".to_v.w")
    ):
        return spec_for_linear(col=True)
    if ".attn." in name and leafname == "w":
        # t5 attention: q/k/v column, o row
        if any(name.endswith(s + ".w") for s in ("q", "k", "v")):
            return P(None, "tp")
        if name.endswith("o.w"):
            return P("tp", None)
    if ".to_out." in name:
        return spec_for_linear(col=False)
    if ".ff.proj_in." in name or ".ff.wi_0." in name or ".ff.wi_1." in name:
        return spec_for_linear(col=True)
    if ".ff.proj_out." in name or ".ff.wo." in name:
        return spec_for_linear(col=False)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a param tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = [
        NamedSharding(mesh, _param_spec(path, leaf)) for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def sharded_leaf_count(params) -> int:
    """How many leaves :func:`_param_spec` actually tp-shards.

    The spec rules match by key name, so a silent rename in the param tree
    would degrade tp>1 to full replication with no error; callers that
    request tensor parallelism must check this is nonzero
    (ShardedGenerator does)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return sum(
        1 for path, leaf in flat
        if any(ax is not None for ax in _param_spec(path, leaf))
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
