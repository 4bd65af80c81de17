#!/usr/bin/env python3
"""Training-log analysis: loss curves + average iter time.

Counterpart of /root/reference/tools/analysis_tools/analyze_logs.py for the
plain-text logs emitted by tools/train.py (epoch N iter M (T s/it) k=v ...).
"""
from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict


LINE = re.compile(
    r"epoch (\d+) iter (\d+) \(([\d.]+)s/it\) (.*)"
)


def parse(path):
    """Parse either the plain-text log or the JSON-lines train_log.jsonl
    (one {"mode": "train", epoch, iter, time, <loss keys>} per point)."""
    import json

    rows = []
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("mode") != "train":
                continue
            rec = dict(rec)
            rec["s_per_it"] = float(rec.pop("time", 0.0))
            rows.append(rec)
            continue
        m = LINE.search(line)
        if not m:
            continue
        ep, it, dt, rest = m.groups()
        kv = dict(
            (k, float(v)) for k, v in re.findall(r"(\S+)=([-\d.einf]+)", rest)
        )
        rows.append({"epoch": int(ep), "iter": int(it),
                     "s_per_it": float(dt), **kv})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--keys", nargs="*", default=["loss"])
    p.add_argument("--plot-out", default=None)
    args = p.parse_args()
    for path in args.logs:
        rows = parse(path)
        if not rows:
            print(f"{path}: no train lines found")
            continue
        avg_t = sum(r["s_per_it"] for r in rows) / len(rows)
        print(f"{path}: {len(rows)} log points, avg {avg_t:.3f}s/it")
        by_ep = defaultdict(list)
        for r in rows:
            by_ep[r["epoch"]].append(r)
        for k in args.keys:
            for ep in sorted(by_ep):
                vals = [r[k] for r in by_ep[ep] if k in r]
                if vals:
                    print(f"  epoch {ep}: {k} mean {sum(vals)/len(vals):.4f}"
                          f" last {vals[-1]:.4f}")
        if args.plot_out:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for k in args.keys:
                xs = [i for i, r in enumerate(rows) if k in r]
                ys = [r[k] for r in rows if k in r]
                plt.plot(xs, ys, label=k)
            plt.legend()
            plt.xlabel("log point")
            plt.savefig(args.plot_out)
            print(f"wrote {args.plot_out}")


if __name__ == "__main__":
    main()
