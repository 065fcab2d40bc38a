"""Summarize a tpu_sweep results directory into one table.

Each sweep item logs either JSON lines (bench.py / run.py / quality.py) or
profile_step output whose first line is `# device total: X ms/iter ...`.
This collects both into a compact digest for PERFORMANCE.md editing:

    python benchmarks/digest.py [--dir benchmarks/results_r2]
"""

from __future__ import annotations

import argparse
import json
import os
import re


def summarize(path: str):
    rows = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".log"):
            continue
        tag = name[:-4]
        done = False
        entries = []
        with open(os.path.join(path, name)) as f:
            for line in f:
                line = line.strip()
                if line == "DONE rc=0":
                    done = True
                    continue
                m = re.match(r"# device total: ([0-9.]+) ms/iter", line)
                if m:
                    entries.append(("device_ms_per_iter", float(m.group(1))))
                    continue
                if line.startswith("{"):
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "value" in d and ("metric" in d or "case" in d):
                        entries.append(
                            (d.get("metric") or d.get("case"), d["value"])
                        )
                    elif "psnr_vs_full" in d:
                        entries.append((d.get("case"), d["psnr_vs_full"]))
                if "VERIFY" in line:
                    entries.append(("verify", line.split()[-1]))
        rows.append((tag, done, entries))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_r2"))
    args = ap.parse_args()
    if not os.path.isdir(args.dir):
        raise SystemExit(f"no results dir {args.dir}")
    for tag, done, entries in summarize(args.dir):
        status = "ok" if done else "INCOMPLETE"
        if not entries:
            print(f"{tag:24s} [{status}] (no parsed metrics)")
        for key, val in entries:
            print(f"{tag:24s} [{status}] {key}: {val}")


if __name__ == "__main__":
    main()
