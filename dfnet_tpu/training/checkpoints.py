"""Checkpointing: flat-npz pytree serialization + auto-resume.

Two formats mirror the reference's (reference: run_nerf.py:150-167 .tar
NeRF dicts, dm/callbacks.py:90-100 bare .pt state dicts):
  - NeRF: <expdir>/<epoch:06d>.npz with params + opt_state + global_step,
    auto-resumed from the latest file (create_nerf parity,
    nerfw.py:452-472 — which, like the reference, does NOT restore the
    optimizer state on resume; we DO store it and restore by default).
  - DFNet: checkpoint[-{epoch:04d}-{val:.4f}].npz bare param trees
    written by EarlyStopping.
Conversion from the reference's torch checkpoints lives in
dfnet_tpu/convert.py.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    elif tree is None:
        out[prefix[:-1] + "@none"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        if key.endswith("@none"):
            key, val = key[: -len("@none")], None
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][1:]))
            return tuple(fix(v) for _, v in items)
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_pytree(path: str, tree, **scalars):
    flat = _flatten({"tree": jax.device_get(tree)})
    for k, v in scalars.items():
        flat[f"__scalar__{k}"] = np.asarray(v)
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_pytree(path: str) -> Tuple[Any, Dict[str, Any]]:
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    scalars = {}
    for k in list(flat):
        if k.startswith("__scalar__"):
            scalars[k[len("__scalar__"):]] = flat.pop(k)
    tree = _unflatten(flat)["tree"]
    return tree, scalars


def latest_checkpoint(expdir: str, pattern: str = r"^(\d+)\.npz$") -> Optional[str]:
    if not osp.isdir(expdir):
        return None
    best, best_step = None, -1
    for f in os.listdir(expdir):
        m = re.match(pattern, f)
        if m and int(m.group(1)) > best_step:
            best, best_step = f, int(m.group(1))
    return osp.join(expdir, best) if best else None
