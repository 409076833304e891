"""Native checkpoint save/restore for audioldm2_tpu param trees.

Two formats:
* **orbax** — the production format (async-capable, sharding-aware),
  replacing the reference's monolithic torch ``.pth``
  (reference pipeline.py:172-174).
* **npz** — a dependency-light flat archive for tooling.

`convert_reference_checkpoint` is the one-time importer: torch .pth ->
param tree -> orbax, so inference never needs torch.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        # orbax rejects zero-size arrays; store a 1-element sentinel
        out[prefix[:-1] + "#none"] = np.zeros((1,), np.float32)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, value in flat.items():
        is_none = key.endswith("#none")
        if is_none:
            key = key[: -len("#none")]
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if is_none else value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_npz(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_npz(path: str):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def save_orbax(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _flatten(params), force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    flat = ckptr.restore(os.path.abspath(path))
    return _unflatten(dict(flat))


def save(path: str, params) -> None:
    if path.endswith(".npz"):
        save_npz(path, params)
    else:
        save_orbax(path, params)


def load(path: str):
    if path.endswith(".npz"):
        return load_npz(path)
    return load_orbax(path)


def convert_reference_checkpoint(pth_path: str, model_name: str, out_path: str) -> None:
    """One-time torch .pth -> native checkpoint conversion (requires torch)."""
    from audioldm2_tpu.config import default_audioldm_config
    from audioldm2_tpu.pipeline import load_checkpoint_params

    cfg = default_audioldm_config(model_name)
    params = load_checkpoint_params(pth_path, cfg)
    save(out_path, params)
