"""Op-level jax.profiler trace of a full training step (VERDICT r4 item 3).

Replaces ablation-by-subtraction evidence with a per-op HLO profile: runs the
jitted train step under `jax.profiler.trace`, then parses the captured
`.xplane.pb` with tensorboard_plugin_profile into the `hlo_stats` table and
prints the top ops by self time (plus a category rollup: convolution / fusion
/ all-reduce / copy / ...).

Usage (TPU):
  env PYTHONPATH=/root/.axon_site:/root/repo \
      JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
      python scripts/op_profile.py --recipe camus_temporal --bf16 \
          [--fused] [--steps 20] [--out /tmp/op_profile_camus.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_train_step import _cfg, _setup  # noqa: E402


def _parse_hlo_stats(xplane_path: str):
    """xplane -> list of dicts (one per HLO op), parsed straight from the
    XSpace proto. (tensorboard_plugin_profile's hlo_stats converter is broken
    against this box's TF build — its pywrap lacks `xspace_to_tools_data` —
    so we aggregate the device-plane op events ourselves: same numbers, no
    converter.)"""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())

    per_op = {}
    for plane in space.planes:
        pname = plane.name.lower()
        if "host" in pname or ("tpu" not in pname and "device" not in pname):
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        # "XLA Ops" lines carry one event per HLO-op execution; "XLA Modules"
        # lines span whole executables and would double-count — skip them.
        lines = [ln for ln in plane.lines if "op" in ln.name.lower()]
        if not lines:
            lines = [ln for ln in plane.lines
                     if "module" not in ln.name.lower()]
        for line in lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.display_name or meta.name
                cat = None
                for st in tuple(ev.stats) + tuple(meta.stats):
                    if stat_names.get(st.metadata_id) == "hlo_category":
                        cat = (st.str_value or
                               stat_names.get(st.ref_value, None))
                row = per_op.setdefault(
                    name, {"hlo op name": name, "category": cat,
                           "occurrences": 0, "total_time_us": 0.0})
                row["occurrences"] += max(int(ev.num_occurrences), 1)
                row["total_time_us"] += ev.duration_ps / 1e6
                if cat and not row["category"]:
                    row["category"] = cat
    return sorted(per_op.values(), key=lambda r: -r["total_time_us"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="camus_temporal",
                    choices=["cardiac", "camus_temporal", "cardiac_full"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--logdir", default="/tmp/ge_op_trace")
    ap.add_argument("--out", default=None, help="write full per-op JSON here")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)

    cfg = _cfg(args.bf16, args.recipe)
    if args.fused:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, fused_fpn_forwards=True))
    step, state, batch = _setup(cfg)

    # compile + warmup OUTSIDE the trace (state is donated: keep the chain)
    s, metrics = step(state, batch)
    float(metrics["total_loss"])

    logdir = f"{args.logdir}_{args.recipe}{'_fused' if args.fused else ''}"
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            s, metrics = step(s, batch)
        float(metrics["total_loss"])  # chain-tail fetch inside the trace

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not xplanes:
        print(json.dumps({"error": "no xplane captured", "logdir": logdir}))
        return
    rows = _parse_hlo_stats(xplanes[-1])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f)

    def fnum(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    # column names per tensorboard_plugin_profile hlo_stats: program_id,
    # HLO op name / category / expression, occurrences, total/avg time, ...
    def col(row, *cands):
        for c in cands:
            for k in row:
                if k and c in str(k).lower():
                    return row[k]
        return None

    total_us = sum(fnum(col(r, "total time (us)", "total_time")) for r in rows)
    by_cat = {}
    for r in rows:
        cat = col(r, "category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + fnum(
            col(r, "total time (us)", "total_time"))
    print(f"== category rollup ({args.recipe}"
          f"{' fused' if args.fused else ''}, {args.steps} steps, "
          f"{total_us / 1e3:.1f} ms total device time) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<32} {us / 1e3:9.2f} ms  {100 * us / total_us:5.1f}%")

    rows.sort(key=lambda r: -fnum(col(r, "total time (us)", "total_time")))
    print(f"== top {args.top} HLO ops by total time ==")
    for r in rows[:args.top]:
        us = fnum(col(r, "total time (us)", "total_time"))
        occ = col(r, "occurrences", "#occurrences") or "?"
        name = str(col(r, "hlo op name", "op name") or "?")[:72]
        cat = col(r, "category") or "?"
        print(f"  {us / 1e3:8.2f} ms {100 * us / total_us:5.1f}% x{occ:>4} "
              f"[{cat}] {name}")


if __name__ == "__main__":
    main()
