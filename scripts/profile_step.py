"""Profile the flagship train step and print a per-fusion device-time table.

Runs the scanned device-pipeline step under ``jax.profiler``, then parses
the Perfetto trace to aggregate device-stream op durations — the
"profile before guessing" tool referenced in docs/DESIGN.md §6.

Usage: python scripts/profile_step.py [--config flagship|men|10m]
                                      [--batch N] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(config: str, batch: int):
    """The EXACT bench setup (shared builder in bench.py), so this profiles
    the same model/step the headline benchmark measures."""
    from bench import build_setup

    step, state, attrs, dd, chunks, inner, tc, mc = build_setup(config, batch)
    return step, state, attrs, dd, chunks[0], inner, tc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship",
                    choices=("flagship", "men", "10m"))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--calls", type=int, default=4,
                    help="traced dispatches (each = inner_steps train steps)")
    args = ap.parse_args()

    from carca_tpu.utils.timing import sync

    step, state, attrs, dd, chunk, inner, tc = build(args.config, args.batch)
    for _ in range(2):  # compile + warm
        state, losses = step(state, attrs, dd.arrays, chunk)
    sync(losses)

    tmp = tempfile.mkdtemp(prefix="carca_profile_")
    jax.profiler.start_trace(tmp)
    for _ in range(args.calls):
        state, losses = step(state, attrs, dd.arrays, chunk)
    sync(losses)
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        raise SystemExit(f"no trace written under {tmp}")
    with gzip.open(sorted(traces)[-1], "rt") as fh:
        events = json.load(fh).get("traceEvents", [])

    # device-stream complete events: pid/tid whose thread name mentions the
    # accelerator op stream. Heuristic: keep events with 'dur' whose args
    # carry a run_id/correlation or whose track name looks device-side.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    by_op: dict[str, list[float]] = defaultdict(list)
    labels: dict[str, str] = {}
    device_total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = names.get((e.get("pid"), e.get("tid")), "")
        low = track.lower()
        if not ("xla op" in low or "stream" in low or "tensorcore" in low
                or "device" in low):
            continue
        if "host" in low or "python" in low:
            continue
        by_op[e["name"]].append(e["dur"])
        device_total += e["dur"]
        a = e.get("args") or {}
        lbl = (a.get("long_name") or a.get("tf_op") or a.get("hlo_op")
               or a.get("source") or "")
        if lbl and e["name"] not in labels:
            labels[e["name"]] = str(lbl)

    n_steps = args.calls * inner
    print(f"# tracks matched: "
          f"{sorted({v for v in names.values() if v})}")
    print(f"# {n_steps} train steps, device total "
          f"{device_total / 1e3:.2f} ms "
          f"({device_total / n_steps:.0f} us/step), batch {tc.batch_size}")
    rows = sorted(by_op.items(), key=lambda kv: -sum(kv[1]))
    print(f"{'us/step':>9}  {'%':>5}  {'calls':>5}  op")
    for name, durs in rows[: args.top]:
        tot = sum(durs)
        print(f"{tot / n_steps:9.1f}  {100 * tot / device_total:5.1f}  "
              f"{len(durs) / args.calls:5.0f}  {name[:50]:50}  "
              f"{labels.get(name, '')[:140]}")


if __name__ == "__main__":
    main()
