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

def classify(name: str, args: dict) -> str:
    """Map one XLA-Ops event to a PARITY.md budget component.

    Uses the trace args (tf_op path, pallas source file, output shape):
    pallas custom calls are told fwd from bwd by their tuple-vs-single
    output, and dot_generals by their tf_op path + whether the output is
    the (L, …) stacked-grad accumulator (dW) or an activation.
    """
    tf_op = args.get("tf_op", "")
    src = args.get("source", "")
    long_name = args.get("long_name", "")
    is_bwd_kernel = " = (" in long_name  # kernels emit grad tuples
    in_bwd = "transpose(" in tf_op

    if "pallas_call" in tf_op or "pallas" in src:
        if "/attention/" in tf_op:
            return ("attention bwd kernel" if is_bwd_kernel
                    else "attention fwd kernel (incl. remat replay)")
        if "/feed_forward/" in tf_op:
            return ("fused FFN bwd kernel" if is_bwd_kernel
                    else "fused FFN fwd kernel (incl. remat replay)")
        if "feature_extractor" in tf_op:
            # FE fwd kernels emit residual tuples too — split on the pass
            # (the feature encoder is not rematerialised, so transpose(...)
            # means the real backward).
            return ("FE fused kernels bwd" if in_bwd
                    else "FE fused kernels fwd")
        if "pos_conv" in tf_op:
            return "positional conv kernels"
        if "ctc" in tf_op or "ctc" in src:
            return "CTC kernels"
        return ("encoder LN/dropout kernels bwd" if is_bwd_kernel
                else "encoder LN/dropout kernels fwd")
    if tf_op.rstrip(":").endswith(("dot_general", "dot")) or \
            args.get("hlo_category", "") == "convolution fusion":
        shape = args.get("shape_with_layout", long_name)
        # dW outputs are the scan-stacked (L, Din, Dout) grad accumulators:
        # small leading dim, 128-aligned weight dims (activations carry the
        # unaligned T).
        m = re.match(r"^\(?(?:bf16|f32|f16)\[(\d+),(\d+),(\d+)\]", shape)
        is_dw = (in_bwd and m is not None and int(m.group(1)) <= 32
                 and int(m.group(2)) % 128 == 0 and int(m.group(3)) % 128 == 0)
        if "feature_extractor" in tf_op or "conv_layers" in tf_op:
            return "FE convs (XLA)"
        if "pos_conv" in tf_op:
            return "positional conv (XLA)"
        where = ("q/k/v/o" if "/attention/" in tf_op
                 else "FFN" if "feed_forward" in tf_op else "head/other")
        if is_dw:
            return f"dW matmuls ({where})"
        return f"{where} matmuls fwd+dx"
    if "optax" in src or "/add:" in tf_op and "state_params" in long_name:
        return "Adam update"
    cat = args.get("hlo_category", "")
    if "convolution" in cat:
        return "FE convs (XLA)"
    if "copy" in cat or name.startswith(("copy", "transpose", "bitcast")):
        return "copies/transposes"
    if "all-reduce" in cat or "collective" in cat:
        return "collectives"
    return "other"


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
    # Per-op events live on the "XLA Ops" thread; the "Steps" / "XLA
    # Modules" threads carry whole-step envelopes that would double-count.
    tid_names = {
        (e["pid"], e["tid"]): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    op_tracks = {
        key for key, name in tid_names.items()
        if key[0] in tpu_pids and name == "XLA Ops"
    }
    step_tracks = {
        key for key, name in tid_names.items()
        if key[0] in tpu_pids and name == "Steps"
    }

    # Trace-viewer events nest (whole-step module -> while scans -> leaf
    # ops on the same track), so summing raw durations triple-counts.
    # Compute SELF time per event with a per-track interval sweep: an
    # event's self time is its duration minus its direct children's.
    durs: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    steps = 0
    name_args: dict[str, dict] = {}
    by_track: dict[tuple, list[dict]] = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_tracks:
            if key in step_tracks:
                steps += 1
                continue
            if key not in op_tracks:
                continue
        elif tpu_pids and e.get("pid") not in tpu_pids:
            continue
        name_args.setdefault(e.get("name", ""), e.get("args", {}))
        by_track[key].append(e)
    for track in by_track.values():
        # Sort by start ascending, then duration descending (parents first).
        track.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: list[list] = []  # [end_ts, child_time, name]
        def pop_into_parent(frame):
            nonlocal total, steps
            name, self_t = frame[2], frame[3] - frame[1]
            if name.startswith("jit_") or name in ("train_step",):
                steps += 1
                return
            durs[name] += self_t
            counts[name] += 1
            total += self_t
        for e in track:
            ts, dur = e["ts"], e["dur"]
            while stack and stack[-1][0] <= ts + 1e-9:
                pop_into_parent(stack.pop())
            if stack:
                stack[-1][1] += dur  # child time inside the parent
            stack.append([ts + dur, 0.0, e.get("name", ""), dur])
        while stack:
            pop_into_parent(stack.pop())

    n_steps = args.steps or max(1, steps)
    print(f"total device time: {total / 1e3:.1f} ms over ~{n_steps} steps "
          f"({total / 1e3 / n_steps:.1f} ms/step)\n")

    print(f"top {args.top} ops (ms/step):")
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur / 1e3 / n_steps:9.2f}  x{counts[name]:<5d}  {name[:100]}")

    grouped: dict[str, float] = collections.defaultdict(float)
    members: dict[str, list] = collections.defaultdict(list)
    for name, dur in durs.items():
        comp = classify(name, name_args.get(name, {}))
        grouped[comp] += dur
        members[comp].append((dur, name))
    print("\ncomponent groups (ms/step):")
    for comp, dur in sorted(grouped.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / 1e3 / n_steps:9.2f}  {comp}")
        for d, n in sorted(members[comp], reverse=True)[:4]:
            print(f"             . {d / 1e3 / n_steps:7.2f}  {n[:80]}")


if __name__ == "__main__":
    main()
