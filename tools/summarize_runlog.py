"""Summarise a tools/r3_tpu_runbook.sh log into one line per config.

Each runbook entry is `=== <command>` followed by the probe's output (one
JSON line on success) and `--- rc=<N>`. Prints a compact table sorted by
throughput so the bench.py headline config can be picked at a glance.

    python tools/summarize_runlog.py /tmp/r3_tpu_run.log
"""

from __future__ import annotations

import json
import re
import sys


def parse(path: str):
    entries = []
    cmd, payload, rc = None, None, None
    for line in open(path, errors="replace"):
        line = line.rstrip("\n")
        if line.startswith("=== "):
            cmd, payload, rc = line[4:], None, None
        elif line.startswith("--- rc="):
            rc = int(line.split("=", 1)[1])
            entries.append((cmd, payload, rc))
            cmd, payload = None, None
        elif line.startswith("{") and line.endswith("}"):
            try:
                payload = json.loads(line)
            except ValueError:
                pass
    return entries


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_tpu_run.log"
    rows = []
    for cmd, payload, rc in parse(path):
        short = re.sub(r"^python tools/", "", cmd or "?")
        short = short.replace("bench_config.py --steps 12 ", "w2v2 ")
        short = short.replace("bench_whisper.py --steps 8", "whisper")
        if rc != 0:
            rows.append((float("-inf"), f"{short:60s} FAILED rc={rc}"))
        elif payload is None:
            rows.append((float("-inf"), f"{short:60s} no JSON"))
        else:
            tput = payload.get("audio_sec_per_sec_per_chip") or payload.get(
                "value"
            ) or payload.get("audio_sec_per_sec") or 0.0
            step = payload.get("step_ms", "")
            rows.append(
                (float(tput), f"{short:60s} {tput:>8} a/s/s  step {step} ms")
            )
    for _, line in sorted(rows, reverse=True):
        print(line)


if __name__ == "__main__":
    main()
