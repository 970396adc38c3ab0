"""Native checkpoint IO (msgpack pytrees) + reference-format naming.

Replaces the reference's rank-0 `torch.save(state_dict)` per epoch
(lxmert_pretrain.py:549,675-677). Same naming contract (`Epoch%02d_LXRT`)
so resume-by-name keeps working (lxmert_pretrain.py:679-685), but the
payload is a flax msgpack pytree with fp32 leaves.

Torch `.pth` checkpoints (the released Epoch20_LXRT.pth / G_60.pth) load
through core/convert.py instead.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def merge_params(target: Any, loaded: Any):
    """Overlay `loaded` onto `target` where paths match — strict=False
    checkpoint loading (the reference loads every checkpoint this way).
    Returns (merged, missing_paths, unexpected_paths)."""
    missing, unexpected = [], []

    def walk(t, l, prefix):
        if not isinstance(t, dict):
            return l
        out = {}
        for k, v in t.items():
            if isinstance(l, dict) and k in l:
                out[k] = walk(v, l[k], prefix + (k,))
            else:
                missing.append("/".join(prefix + (k,)))
                out[k] = v
        if isinstance(l, dict):
            for k in l:
                if k not in t:
                    unexpected.append("/".join(prefix + (k,)))
        return out

    return walk(target, loaded, ()), missing, unexpected


def epoch_ckpt_name(epoch: int) -> str:
    """Reference naming: Epoch%02d_LXRT (lxmert_pretrain.py:549)."""
    return f"Epoch{epoch:02d}_LXRT.msgpack"


def parse_start_epoch(path: str) -> int:
    """Resume epoch from a checkpoint name (lxmert_pretrain.py:679-685)."""
    m = re.search(r"Epoch(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def load_any_checkpoint(path: str) -> Any:
    """Load either our msgpack format or a torch .pth (converted)."""
    if path.endswith((".pth", ".pt", ".bin")):
        from xlxmert_tpu.core.convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    return load_pytree(path)
