#!/usr/bin/env python
"""One-shot check: our rebuilt Kaiser-sinc filter table vs resampy's shipped one.

The reference resamples with ``resampy.resample(..., filter='kaiser_best')``
(reference: fad.py:157-159). ops/resample.py rebuilds that filter from the
published constants (64 zero crossings, 2**9 entries/crossing, beta
14.769656459379492, rolloff 0.9475937167399596 — resampy/filters.py); this
script diffs the rebuilt table against the table resampy actually ships, and
additionally diffs end-to-end resampled audio, recording the numbers for
PARITY.md. Skips gracefully (exit 0, "SKIP") when resampy is not installed —
it is not baked into this image and cannot be fetched (zero egress).

Usage: python scripts/diff_resampy_table.py [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", default=None, help="write machine-readable results here")
    args = ap.parse_args()

    results = {"status": "SKIP", "reason": "resampy not installed"}
    try:
        import resampy.filters
    except ImportError:
        print("[SKIP] resampy not installed in this environment "
              "(zero egress; rerun wherever resampy is available)")
        if args.json:
            json.dump(results, open(args.json, "w"), indent=2)
        return 0

    from frechet_audio_distance_exported_tpu.ops import resample as rs

    results = {"status": "PASS", "filters": {}}
    worst = 0.0
    for name, params in rs.FILTERS.items():
        ours, num_table = rs.sinc_window(**params)
        theirs = np.asarray(_get_filter_tuple(resampy, name)[0], dtype=np.float64)
        if ours.shape != theirs.shape:
            results["filters"][name] = {
                "status": "FAIL",
                "detail": f"shape {ours.shape} vs {theirs.shape}",
            }
            results["status"] = "FAIL"
            print(f"[FAIL] {name}: table shape {ours.shape} vs {theirs.shape}")
            continue
        d = float(np.max(np.abs(ours - theirs)))
        worst = max(worst, d)
        ok = d < 1e-12
        results["filters"][name] = {"status": "PASS" if ok else "FAIL", "max_abs_diff": d}
        if not ok:
            results["status"] = "FAIL"
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: max abs table diff {d:.3e} "
              f"({len(ours)} taps, 2**{params['precision']}/crossing)")

    # End-to-end audio diff at the pipeline's real rate pairs.
    import resampy

    rng = np.random.default_rng(0)
    results["audio"] = {}
    for sr_o, sr_n in [(16000, 24000), (44100, 16000), (32000, 48000), (48000, 16000)]:
        x = rng.standard_normal(sr_o).astype(np.float64) * 0.3
        ours = rs.resample(x.astype(np.float32), sr_o, sr_n)
        theirs = resampy.resample(x, sr_o, sr_n, filter="kaiser_best")
        n = min(len(ours), len(theirs))
        d = float(np.max(np.abs(np.asarray(ours[:n], np.float64) - theirs[:n])))
        ok = d < 1e-5 and len(ours) == len(theirs)
        results["audio"][f"{sr_o}->{sr_n}"] = {
            "status": "PASS" if ok else "FAIL",
            "max_abs_diff": d,
            "len_ours": len(ours),
            "len_theirs": len(theirs),
        }
        if not ok:
            results["status"] = "FAIL"
        print(f"[{'PASS' if ok else 'FAIL'}] resample {sr_o}->{sr_n}: "
              f"max abs diff {d:.3e} (len {len(ours)} vs {len(theirs)})")

    if args.json:
        json.dump(results, open(args.json, "w"), indent=2)
    print(f"overall: {results['status']} (worst table diff {worst:.3e})")
    return 0 if results["status"] in ("PASS", "SKIP") else 1


def _get_filter_tuple(resampy_mod, name):
    """resampy's get_filter returned (half_window, precision) before 0.3 and
    (half_window, precision, rolloff) from 0.3 on; the half_window table is
    always element 0, so callers index [0] and never unpack."""
    return tuple(resampy_mod.filters.get_filter(name))


if __name__ == "__main__":
    sys.exit(main())
