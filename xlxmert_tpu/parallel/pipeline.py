"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2.4: "PP — NO —
n/a"), and at ~240M params this model does not need it. This module
exists to prove the mesh design extends beyond dp x tp to layer-sharded
execution — the capability a larger LXRT variant would need — and it is
exercised by `__graft_entry__.dryrun_multichip` on a (data, pipe) mesh
and by tests/test_pipeline.py against the unsharded stack.

TPU-native shape of the idea:
  - the params of L homogeneous layers are STACKED to (L, ...) leaves
    (`stack_layers`) and the layer axis is sharded over `pipe` — each
    stage owns L/S consecutive layers, applied with a local `lax.scan`;
  - one `jax.shard_map` runs the classic microbatch schedule: M
    microbatches flow through S stages over M+S-1 ticks; activations
    hop stage s -> s+1 via `lax.ppermute` (XLA overlaps the ICI send
    with the next tick's compute);
  - the schedule is a `lax.scan` over ticks, so the whole pipeline is
    one differentiable jitted program: reverse-mode AD flows through
    `ppermute`'s transpose (the reverse ring) — training, not just
    inference;
  - composes with the `data` axis: batch leaves are sharded over
    `data`, each data shard runs its own microbatch stream.

Cost model: the bubble is the usual (S-1)/(M+S-1) idle fraction; at the
demo scale (and this model's size) PP is strictly worse than pure DP —
which is exactly what SURVEY §2.4 concluded. Use when a model variant's
layer params exceed one chip's HBM.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layers(layer_params: Sequence[Any]):
    """Stack per-layer param pytrees to (L, ...) leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def stack_language_layers(params: Any, n_layers: int):
    """Stack the LXMERT language stack (params['encoder']['layer_i'],
    models/lxmert.py:390-392 — torch-named after BERT's `layer`)."""
    return stack_layers([params["encoder"][f"layer_{i}"]
                         for i in range(n_layers)])


def pipeline_apply(layer_fn: Callable[[Any, Any], Any], stacked_params: Any,
                   carry: Any, *, mesh: Mesh, n_micro: int,
                   data_axis: str = "data", pipe_axis: str = "pipe"):
    """Run `carry` through all L stacked layers, pipelined over
    `pipe_axis` with `n_micro` microbatches per data shard.

    layer_fn(one_layer_params, carry) -> carry applies ONE layer; it
    must be shape-preserving (the same activation pytree flows through
    every stage). Non-hidden leaves (e.g. the attention bias) simply
    ride along — they travel with their microbatch through the ring.

    `carry` leaves are (B, ...) with B divisible by
    n_micro * mesh.shape[data_axis]; `stacked_params` leaves are
    (L, ...) with L divisible by mesh.shape[pipe_axis].

    Returns the final carry, numerically equal to applying the L layers
    sequentially (pinned in tests/test_pipeline.py).
    """
    S = mesh.shape[pipe_axis]
    M = n_micro

    def _per_device(lp, c):
        # promote everything to "varying over BOTH mesh axes" up front:
        # the scan carry must have a stable vma type across iterations
        # (state starts stage-local but becomes pipe-varying after the
        # first ppermute), and layer params (pipe-varying) meet
        # activations (data-varying) inside layer_fn
        lp = jax.tree.map(lambda a: jax.lax.pcast(a, (data_axis,), to='varying'), lp)
        c = jax.tree.map(lambda a: jax.lax.pcast(a, (pipe_axis,), to='varying'), c)
        s = jax.lax.pcast(jax.lax.axis_index(pipe_axis), (data_axis,), to='varying')
        micro = jax.tree.map(
            lambda a: a.reshape(M, a.shape[0] // M, *a.shape[1:]), c)
        state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), micro)
        ybuf = jax.tree.map(jnp.zeros_like, micro)

        def stage(c1):
            def body(c2, p1):
                return layer_fn(p1, c2), None
            out, _ = jax.lax.scan(body, c1, lp)
            return out

        def tick(loop, t):
            state, ybuf = loop
            t = jax.lax.pcast(t, (data_axis, pipe_axis), to='varying')
            # stage 0 ingests microbatch t (clamped junk after M — its
            # output cannot reach the last stage within the loop);
            # others take what the previous stage sent last tick
            inp = jax.tree.map(
                lambda m, st: jnp.where(
                    s == 0,
                    jax.lax.dynamic_index_in_dim(
                        m, jnp.minimum(t, M - 1), 0, keepdims=False),
                    st),
                micro, state)
            y = stage(inp)
            # the last stage finished microbatch t-(S-1) this tick
            idx = t - (S - 1)
            write = (idx >= 0) & (s == S - 1)
            ybuf = jax.tree.map(
                lambda buf, yy: jnp.where(
                    write,
                    jax.lax.dynamic_update_index_in_dim(
                        buf, yy, jnp.maximum(idx, 0), 0),
                    buf),
                ybuf, y)
            state = jax.lax.ppermute(
                y, pipe_axis, [(i, (i + 1) % S) for i in range(S)])
            return (state, ybuf), None

        (_, ybuf), _ = jax.lax.scan(tick, (state, ybuf),
                                    jnp.arange(M + S - 1))
        # ybuf is zero except on the last stage -> psum replicates the
        # result over the pipe axis (required by the replicated out_spec)
        ybuf = jax.lax.psum(ybuf, pipe_axis)
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), ybuf)

    return jax.shard_map(
        _per_device, mesh=mesh,
        in_specs=(P(pipe_axis), P(data_axis)),
        out_specs=P(data_axis))(stacked_params, carry)


def place_pipeline(stacked_params: Any, carry: Any, mesh: Mesh,
                   data_axis: str = "data", pipe_axis: str = "pipe"):
    """Device placement matching pipeline_apply's in_specs: layer axis
    over `pipe`, batch leaves over `data` (replicated over `pipe`)."""
    lp = jax.device_put(stacked_params, NamedSharding(mesh, P(pipe_axis)))
    c = jax.device_put(carry, NamedSharding(mesh, P(data_axis)))
    return lp, c
