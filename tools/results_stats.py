#!/usr/bin/env python
"""Distribution statistics over quality-report RESULTS.md files.

The full-scale protocols (704 test objects, docs/QUALITY_SYNTHETIC.md)
make per-object tails the interesting statistic — mean ± std hides what
p5/min and threshold fractions show (e.g. the chair single-view-ambiguity
tail). This reads the per-object table `tools/quality_report.py` writes
and prints, per file: mean/std/median/p5/p95/min/max PSNR, mean SSIM, and
the fraction of objects above 15/20/25 dB. With two or more files the
first is the baseline and every later file also gets a per-object paired
delta (the runs share object indices when they share the scene seed, so
pairing is exact).

Usage:
  python tools/results_stats.py /tmp/q_cars/RESULTS.md [more.md ...]
  python tools/results_stats.py --json a.md b.md      # machine-readable
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

ROW = re.compile(r"^\|\s*(heldout_\d+)\s*\|\s*([-\d.]+)\s*\|\s*([-\d.]+)\s*\|")


def load(path: str) -> dict:
    """Parse one RESULTS.md -> {name: (psnr, ssim)} keyed by object row."""
    rows = {}
    with open(path) as f:
        for line in f:
            m = ROW.match(line)
            if m:
                rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    if not rows:
        raise SystemExit(f"{path}: no per-object rows found")
    return rows


def stats(rows: dict) -> dict:
    p = np.array([v[0] for v in rows.values()])
    s = np.array([v[1] for v in rows.values()])
    return {
        "n": int(p.size),
        "psnr_mean": float(p.mean()), "psnr_std": float(p.std(ddof=1)) if p.size > 1 else 0.0,
        "psnr_median": float(np.median(p)),
        "psnr_p5": float(np.percentile(p, 5)),
        "psnr_p95": float(np.percentile(p, 95)),
        "psnr_min": float(p.min()), "psnr_max": float(p.max()),
        "ssim_mean": float(s.mean()),
        "frac_gt_15": float((p > 15).mean()),
        "frac_gt_20": float((p > 20).mean()),
        "frac_gt_25": float((p > 25).mean()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    all_rows = {f: load(f) for f in args.files}
    out = {}
    base_path = args.files[0]
    base = all_rows[base_path]
    for path in args.files:
        st = stats(all_rows[path])
        if path != base_path:
            shared = sorted(set(base) & set(all_rows[path]),
                            key=lambda k: int(k.split("_")[1]))
            if shared:
                d = np.array([all_rows[path][k][0] - base[k][0]
                              for k in shared])
                st["paired_delta_mean"] = float(d.mean())
                st["paired_delta_std"] = float(d.std(ddof=1)) if d.size > 1 else 0.0
                st["paired_n"] = int(d.size)
                st["paired_frac_improved"] = float((d > 0).mean())
        out[path] = st

    if args.json:
        print(json.dumps(out, indent=2))
        return
    for path, st in out.items():
        name = os.path.relpath(path)
        print(f"{name}  (n={st['n']})")
        print(f"  PSNR  mean {st['psnr_mean']:.2f} ± {st['psnr_std']:.2f}  "
              f"median {st['psnr_median']:.2f}  p5 {st['psnr_p5']:.2f}  "
              f"p95 {st['psnr_p95']:.2f}  min {st['psnr_min']:.2f}  "
              f"max {st['psnr_max']:.2f}")
        print(f"  SSIM  mean {st['ssim_mean']:.4f}   "
              f">15dB {st['frac_gt_15']:.1%}  >20dB {st['frac_gt_20']:.1%}  "
              f">25dB {st['frac_gt_25']:.1%}")
        if "paired_delta_mean" in st:
            print(f"  vs {os.path.relpath(base_path)}: paired Δ "
                  f"{st['paired_delta_mean']:+.2f} ± {st['paired_delta_std']:.2f} dB "
                  f"over {st['paired_n']} shared objects "
                  f"({st['paired_frac_improved']:.1%} improved)")


if __name__ == "__main__":
    main()
