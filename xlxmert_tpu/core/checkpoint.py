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
import threading
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    """Atomic checkpoint write: serialize to `path + '.tmp'`, then
    os.replace — a run killed mid-save never leaves a truncated file
    that resume-by-name would then load (the reference's plain
    torch.save has exactly that failure mode)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk write with training.

    The D2H snapshot happens synchronously in save() — it MUST: the
    jitted train steps donate the state (tasks/pretrain.py
    donate_argnums), so the old params' device buffers are invalid the
    moment the next step is dispatched, and a background device_get
    would race that. Serialization + the file write (the dominant cost
    for a GB-scale checkpoint on local disk) then run on a background
    thread. At most one save is in flight: save() first waits for the
    previous one (bounding host memory at one snapshot) and re-raises
    any error it hit. Call wait() before exit/resume-critical points.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def save(self, tree: Any, path: str) -> None:
        self.wait()
        # np.array(copy=True): np.asarray would ALIAS host-numpy leaves,
        # and the caller may reuse those buffers while we write
        host_tree = jax.tree.map(lambda x: np.array(x, copy=True), tree)

        def work():
            try:
                save_pytree(host_tree, path)
            except BaseException as e:  # re-raised on the caller's thread
                self._exc = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def save_full(self, full_tree: Any, full_path: str,
                  params_path: str) -> None:
        """One host snapshot, two files: the full train-state checkpoint
        AND its params slice (the reference-named Epoch%02d_LXRT file).
        The D2H copy is shared; the params bytes are still serialized
        into each file (msgpack has no shared-subtree reuse) — the win
        is the single device fetch plus both writes off the epoch
        loop."""
        self.wait()
        host_tree = jax.tree.map(lambda x: np.array(x, copy=True), full_tree)

        def work():
            try:
                save_pytree(host_tree, full_path)
                save_pytree(host_tree["params"], params_path)
            except BaseException as e:
                self._exc = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


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
            ts = getattr(t, "shape", None)
            ls = getattr(l, "shape", None)
            if ts is not None and ls is not None and tuple(ts) != tuple(ls):
                # a name-matched leaf from a DIFFERENT model config must
                # fail loudly — silently overlaying e.g. a smaller vocab
                # embedding produces clamped gathers and wrong logits
                raise ValueError(
                    f"checkpoint shape mismatch at {'/'.join(prefix)}: "
                    f"loaded {tuple(ls)} vs model {tuple(ts)} "
                    "(different model config?)")
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


def train_state_to_tree(state, total_steps: Optional[int] = None) -> dict:
    """TrainState -> plain pytree for full-fidelity checkpoints (params
    + optimizer moments + step). The reference saves only the model
    state_dict and rebuilds optimizer/scheduler on resume
    (lxmert_pretrain.py:675-685) — Adam moments are lost and the LR
    schedule restarts from warmup. This is the exact-resume extension.
    `total_steps` records the LR-schedule horizon so resume can detect
    a changed horizon (bit-exactness only holds when it matches)."""
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if total_steps is not None:
        tree["total_steps"] = np.asarray(total_steps, np.int32)
    return tree


def restore_state(state, tree_or_path):
    """Generic exact-restore of any flax PyTreeNode state (TrainState,
    GanState, ...) from a `serialization.to_state_dict`-shaped tree,
    preserving each leaf's device sharding. Structure must match
    exactly (loud failure when the config changed between save and
    resume). Returns (state, saved_total_steps or None)."""
    import jax.numpy as jnp
    from flax import serialization

    tree = (load_pytree(tree_or_path) if isinstance(tree_or_path, str)
            else dict(tree_or_path))
    saved_total = tree.pop("total_steps", None)
    if saved_total is not None:
        saved_total = int(np.asarray(saved_total))
    restored = serialization.from_state_dict(state, tree)
    placed = jax.tree.map(
        lambda x, ref: jax.device_put(jnp.asarray(x), ref.sharding),
        restored, state)
    return placed, saved_total


def restore_train_state(state, tree_or_path):
    """TrainState flavor of restore_state: accepts the {params,
    opt_state, step[, total_steps]} trees written by cli/pretrain
    --save_full_state. Returns (state, saved_total_steps or None) —
    the caller should compare the horizon against its own
    (cli/pretrain warns on mismatch)."""
    return restore_state(state, tree_or_path)


def is_full_state_tree(tree: Any) -> bool:
    return (isinstance(tree, dict)
            and {"params", "opt_state", "step"} <= set(tree))


def epoch_ckpt_name(epoch: int) -> str:
    """Reference naming: Epoch%02d_LXRT (lxmert_pretrain.py:549)."""
    return f"Epoch{epoch:02d}_LXRT.msgpack"


def parse_start_epoch(path: str) -> int:
    """Resume epoch from a checkpoint name (lxmert_pretrain.py:679-685)."""
    m = re.search(r"Epoch(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def load_any_checkpoint(path: str, keep_full_state: bool = False) -> Any:
    """Load either our msgpack format or a torch .pth (converted).

    Full-state checkpoints (Epoch%02d_FULL.msgpack) are unwrapped to
    their params subtree by default, so every params-consuming path
    (finetune --loadLXMERT, serve, sample) works transparently instead
    of silently matching nothing in a strict=False overlay. Pass
    keep_full_state=True to get the whole {params, opt_state, step}
    tree (cli/pretrain's exact resume)."""
    if path.endswith((".pth", ".pt", ".bin")):
        from xlxmert_tpu.core.convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    tree = load_pytree(path)
    if is_full_state_tree(tree) and not keep_full_state:
        return tree["params"]
    return tree
