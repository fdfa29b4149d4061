"""Summarise a JAX profiler trace into per-component step time.

Reads the ``*.trace.json.gz`` (trace-viewer JSON) a ``--profile-dir``
capture writes, aggregates TPU-track event durations by HLO op name, and
groups them into the step-budget components PARITY.md tracks, so each perf
round's attribution table comes from one command:

    python tools/analyze_trace.py /tmp/r4_trace [--steps N] [--top K]

``--steps`` divides totals by the number of profiled steps (default:
inferred from the number of train-step begin events when possible, else 1).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

GROUPS: list[tuple[str, str]] = [
    # (component, regex over op/event name) — first match wins.
    ("attention fwd kernel", r"short.*attention.*fwd|_fwd_kernel|attention_fwd"),
    ("attention bwd kernel", r"short.*attention.*bwd|_bwd_kernel|attention_bwd"),
    ("attention (custom call)", r"attention"),
    ("fused FE conv kernel", r"conv_ln_gelu|_fwd_kernel|conv.*ln.*gelu"),
    ("FE conv (XLA)", r"convolution|conv_general"),
    ("fused FFN kernel", r"ffn_fc1|ffn_ln_fc1|ffn.*kernel"),
    ("ln_dense kernel", r"ln_dense|lnmm"),
    ("LayerNorm kernels", r"ln_gelu|ln_fused|layer_norm|layernorm"),
    ("gelu/dropout kernels", r"gelu_dropout|gelu"),
    ("CTC kernel", r"ctc"),
    ("matmuls (dot/fusion)", r"dot|fusion"),
    ("copies/transposes", r"copy|transpose|bitcast"),
    ("dynamic-update/stack", r"dynamic-update|dynamic_update|scatter"),
    ("reduce/elementwise", r"reduce|add|multiply|select|broadcast"),
]


def load_trace(profile_dir: str) -> list[dict]:
    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("profile_dir")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--group", action="store_true", default=True)
    args = p.parse_args()

    events = load_trace(args.profile_dir)

    # Identify TPU device tracks (process names like "/device:TPU:0" or
    # "TPU:0"; fall back to all complete events with durations).
    pid_names = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name.upper() or "device" in name.lower()
    }

    durs: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    steps = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name in ("train_step",):
            steps += 1
            continue
        durs[name] += e["dur"]
        counts[name] += 1
        total += e["dur"]

    n_steps = args.steps or max(1, steps)
    print(f"total device time: {total / 1e3:.1f} ms over ~{n_steps} steps "
          f"({total / 1e3 / n_steps:.1f} ms/step)\n")

    print(f"top {args.top} ops (ms/step):")
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur / 1e3 / n_steps:9.2f}  x{counts[name]:<5d}  {name[:100]}")

    grouped: dict[str, float] = collections.defaultdict(float)
    for name, dur in durs.items():
        for comp, pattern in GROUPS:
            if re.search(pattern, name, re.IGNORECASE):
                grouped[comp] += dur
                break
        else:
            grouped["other"] += dur
    print("\ncomponent groups (ms/step):")
    for comp, dur in sorted(grouped.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / 1e3 / n_steps:9.2f}  {comp}")


if __name__ == "__main__":
    main()
