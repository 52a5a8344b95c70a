"""Parse jax.profiler Chrome traces (vm.trace.json.gz) for device truth.

The xplane protobuf parsers aren't importable in this image, but the
trace.json.gz written next to the xplane carries the same device timeline
(pid named '/device:TPU:...', lines 'Steps' / 'XLA Modules' / 'XLA Ops'),
including per-op `args.source` attribution.  Device span is relay-proof:
it is measured by the device itself, so it adjudicates host-side timing
protocols (BENCH_NOTES round 2 anomaly).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re


def load_latest_trace(logdir: str) -> list[dict]:
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    data = json.load(gzip.open(paths[-1]))
    return data["traceEvents"] if isinstance(data, dict) else data


def device_summary(events: list[dict], top: int = 25) -> dict:
    """Returns {span_ms, busy_ms, modules: [(name, ms)], by_source, top_ops}.

    span_ms: wall duration of the device 'XLA Modules' line (total device
    timeline including gaps) — divide by the number of steps traced for a
    relay-proof per-step time."""
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "GPU" in n}
    if not dev_pids:
        raise ValueError(f"no device pid in trace: {pid_names}")

    mod_line = {
        k for k, n in tid_names.items() if n == "XLA Modules" and k[0] in dev_pids
    }
    op_line = {
        k for k, n in tid_names.items() if n == "XLA Ops" and k[0] in dev_pids
    }
    span_lo, span_hi = float("inf"), 0.0
    modules = collections.Counter()
    by_source = collections.Counter()
    op_tot = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        k = (e["pid"], e["tid"])
        if k in mod_line:
            span_lo = min(span_lo, e["ts"])
            span_hi = max(span_hi, e["ts"] + e.get("dur", 0))
            modules[re.sub(r"\(\d+\)$", "", e["name"])] += e.get("dur", 0)
        elif k in op_line and not e["name"].startswith("while"):
            src = e.get("args", {}).get("source", "?")
            by_source[src] += e.get("dur", 0)
            op_tot[re.sub(r"\.\d+$", "", e["name"])] += e.get("dur", 0)
    return dict(
        span_ms=(span_hi - span_lo) / 1e3 if span_hi else 0.0,
        busy_ms=sum(modules.values()) / 1e3,
        modules=[(n, round(v / 1e3, 3)) for n, v in modules.most_common(8)],
        by_source=[(s, round(v / 1e3, 3)) for s, v in by_source.most_common(top)],
        top_ops=[(n, round(v / 1e3, 3)) for n, v in op_tot.most_common(top)],
    )


def print_summary(logdir: str, steps: int, top: int = 20) -> dict:
    s = device_summary(load_latest_trace(logdir), top=top)
    print(
        json.dumps(
            dict(
                device_span_ms=round(s["span_ms"], 3),
                per_step_ms=round(s["span_ms"] / max(steps, 1), 3),
                busy_ms=round(s["busy_ms"], 3),
                modules=s["modules"],
            )
        ),
        flush=True,
    )
    print("top sources (device ms, excl. while wrappers):", flush=True)
    for src, ms in s["by_source"][:top]:
        print(f"  {ms:9.3f} ms  {src}", flush=True)
    print("top ops:", flush=True)
    for name, ms in s["top_ops"][:top]:
        print(f"  {ms:9.3f} ms  {name}", flush=True)
    return s
