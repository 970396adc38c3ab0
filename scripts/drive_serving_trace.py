"""Trace-level attribution of the B=256 int8 serving program (VERDICT r4
item #1): run the exact bench-shaped program (K dependent forwards in one
lax.scan) under jax.profiler, parse the xplane device plane with xprof,
and aggregate XLA-op time into categories comparable to CEILING.md §1's
round-2 ablation split (LN / softmax / quant+attention residual).

The round-2 split was measured by program ablation on a since-rolled
toolchain; this measures the real program op-by-op on the current one.

  python scripts/drive_serving_trace.py            # real TPU
  python scripts/drive_serving_trace.py --json /tmp/serving_trace.json

Output: per-category table (us/sample at B), top ops by total time, and
one JSON blob for docs/CEILING.md §1.
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--batch", type=int, default=256)
parser.add_argument("--scan_k", type=int, default=20)
parser.add_argument("--json", default="")
parser.add_argument("--bf16", action="store_true",
                    help="trace the bf16 path instead of int8 static")
args = parser.parse_args()


# Op-name -> category. Names observed on the current toolchain; anything
# unmatched lands in "other" and is printed so the map can be extended.
CATEGORIES = [
    ("gemm", re.compile(
        r"(convolution|dot|cublas|matmul)", re.I)),
    ("layernorm", re.compile(r"(layer_?norm|variance|norm)", re.I)),
    ("softmax", re.compile(r"(softmax|exponential|divide.*reduce)", re.I)),
    ("quant", re.compile(r"(round|clamp|quant|convert)", re.I)),
    ("copy", re.compile(r"^(copy|bitcast|reshape|transpose|broadcast)", re.I)),
    ("loop", re.compile(r"(while|condition|tuple|parameter)", re.I)),
]


def categorize(name: str, fusion_kind_hints: dict) -> str:
    base = name.split("(")[0]
    hint = fusion_kind_hints.get(base)
    if hint:
        return hint
    for cat, rx in CATEGORIES:
        if rx.search(base):
            return cat
    return "other"


def main():
    import jax
    import jax.numpy as jnp

    from xlxmert_tpu.core.config import LxmertConfig
    from xlxmert_tpu.models.lxmert import (LxmertModel, VisualAnswerHead,
                                           serving_mode)
    from xlxmert_tpu.serving import lxmert_int8 as engine
    from xlxmert_tpu.utils.boxes import box_position

    serving_mode(True)
    cfg = LxmertConfig()
    B, L, V = args.batch, 20, 64
    K = args.scan_k

    model = LxmertModel(cfg, dtype=jnp.bfloat16)
    head = VisualAnswerHead(cfg, num_labels=3129, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    feats = jax.random.normal(rng, (B, V, cfg.visual_feat_dim),
                              jnp.bfloat16) * 0.1
    pos = jnp.broadcast_to(jnp.asarray(box_position(8))[None],
                           (B, V, 4)).astype(jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(lambda r: model.init(
        r, ids, feats, pos, attention_mask=mask)["params"])(rng)
    head_params = head.init(rng, jnp.zeros((B, cfg.hidden_size)))["params"]
    print(f"init {time.time()-t0:.0f}s", flush=True)

    if args.bf16:
        bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        bf16_head = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                 head_params)

        @jax.jit
        def run(ids, pos, mask, stacked, seed):
            def body(carry, f):
                _, _, pooled = model.apply(
                    {"params": bf16_params}, ids, f + carry * 1e-6, pos,
                    attention_mask=mask, deterministic=True)
                logits = head.apply({"params": bf16_head}, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, seed, stacked)
            return c
        label = "bf16"
    else:
        params_f32 = jax.tree.map(np.asarray, params)
        qp = engine.prepare_params(params_f32, cfg)
        hqp = engine.prepare_answer_head(jax.tree.map(np.asarray,
                                                      head_params))
        Bc = 8
        calib_batch = (ids[:Bc], feats[:Bc].astype(jnp.float32), pos[:Bc],
                       mask[:Bc])
        calib = engine.calibrate(qp, hqp, [calib_batch], cfg)
        sqp = engine.apply_calibration(qp, calib)
        shqp = engine.apply_calibration(hqp, calib)
        print(f"calibrated {len(calib)} sites", flush=True)

        @jax.jit
        def run(ids, pos, mask, stacked, seed):
            def body(carry, f):
                _, _, pooled = engine.lxmert_forward(
                    sqp, ids, f + carry * 1e-6, pos, attention_mask=mask,
                    n_heads=cfg.num_attention_heads)
                logits = engine.answer_head_forward(shqp, pooled)
                return carry + logits.mean().astype(jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, seed, stacked)
            return c
        label = "int8_static"

    stacked = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (K, B, V, cfg.visual_feat_dim),
        jnp.bfloat16) * 0.1)()
    # warm (compile) + one timed reference run
    float(run(ids, pos, mask, stacked, jnp.bfloat16(0.0)))
    t0 = time.time()
    float(run(ids, pos, mask, stacked, jnp.bfloat16(1.0)))
    wall = time.time() - t0
    print(f"warm run: {wall*1e3:.1f} ms for K={K} "
          f"({B*K/wall:.0f} q/s incl. round-trip)", flush=True)

    logdir = tempfile.mkdtemp(prefix="serving_trace_")
    jax.profiler.start_trace(logdir)
    float(run(ids, pos, mask, stacked, jnp.bfloat16(2.0)))
    jax.profiler.stop_trace()

    fs = glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb"))
    print("xplane:", fs, flush=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(fs, "trace_viewer", {})
    j = json.loads(data if isinstance(data, str) else data.decode())
    evs = j["traceEvents"]

    # locate the device process (has an "XLA Ops" thread) and that tid
    name_by_pid = {}
    xla_ops_tid = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"]["name"]
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            xla_ops_tid[e["pid"]] = e["tid"]
    dev_pids = [p for p in xla_ops_tid
                if "host" not in name_by_pid.get(p, "").lower()]
    print("device pids:", {p: name_by_pid.get(p) for p in dev_pids},
          flush=True)

    per_op = collections.defaultdict(float)
    per_op_n = collections.defaultdict(int)
    per_src = collections.defaultdict(float)
    arg_sample = {}
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("tid") == xla_ops_tid[e["pid"]]):
            base = e["name"].split("(")[0]
            a = e.get("args", {})
            # while/fusion parents double-count their children: the
            # `while.N` event spans the whole loop body. Exclude parents
            # from totals (hlo_category "while"/"conditional").
            if a.get("hlo_category") in ("while", "conditional"):
                continue
            per_op[base] += e["dur"]          # trace_viewer durs are us
            per_op_n[base] += 1
            per_src[(a.get("hlo_category", "?"),
                     a.get("source", "?"))] += e["dur"]
            if base not in arg_sample:
                arg_sample[base] = a

    total_us = sum(per_op.values())
    print(f"\ndevice XLA-op total: {total_us/1e3:.2f} ms "
          f"({total_us/(B*K):.2f} us/sample at B={B}, K={K})")

    # category rollup; use fusion-kind hints from sampled args when present
    hints = {}
    for base, a in arg_sample.items():
        long_name = str(a.get("long_name", "")) + str(a.get("hlo_op", ""))
        if re.search(r"(dot|conv)", long_name, re.I):
            hints[base] = "gemm"
    cat_us = collections.defaultdict(float)
    for base, us in per_op.items():
        cat_us[categorize(base, hints)] += us

    print(f"\n== category rollup ({label}, B={B}) ==")
    rows = []
    for cat, us in sorted(cat_us.items(), key=lambda kv: -kv[1]):
        rows.append({"category": cat, "us_per_sample": us / (B * K),
                     "share": us / total_us})
        print(f"  {cat:<12} {us/(B*K):7.2f} us/sample  "
              f"{100*us/total_us:5.1f}%")

    print(f"\n== top 25 ops by total time ==")
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    top_rows = []
    for base, us in top:
        cat = categorize(base, hints)
        top_rows.append({"op": base, "us_per_sample": us / (B * K),
                         "n": per_op_n[base], "category": cat})
        print(f"  {us/(B*K):7.3f} us/sample  n={per_op_n[base]:<6} "
              f"[{cat}] {base}")

    print("\n== data-formatting (copy) time by source line ==")
    src_rows = []
    for (hcat, src), us in sorted(per_src.items(), key=lambda kv: -kv[1]):
        if hcat != "data formatting":
            continue
        src_rows.append({"source": src, "us_per_sample": us / (B * K)})
        print(f"  {us/(B*K):7.2f} us/sample  {src}")

    out = {"label": label, "batch": B, "scan_k": K,
           "device_total_us_per_sample": total_us / (B * K),
           "wall_qps_incl_roundtrip": B * K / wall,
           "categories": rows, "top_ops": top_rows,
           "copies_by_source": src_rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
