#!/usr/bin/env python3
"""Schema normalizer for graft.Bench sweep JSONs (r19 ADVICE item 3).

Committed sweep artifacts span three gate-field generations:
  - pre-r19:        window_flag only (no reasons, no pole-match field)
  - early r19:      ratio_context (bench/r19/sweep{1,2}_full.json predate
                    the same-round ratio_context -> ratio_match rename)
  - r19 sweep3+:    ratio_match + flag_reasons
  - r20+:           anchor_eligible emitted by Bench itself

load_sweep() returns the parsed dict with ONE schema regardless of
vintage: ratio_match always present (fallback from ratio_context),
flag_reasons always a list (pre-split files get it derived from
window_flag + the spread threshold where the data allows), and
anchor_eligible always present (flag_reasons empty AND
ratio_match == "idle" — the BASELINE.md anchors-header rule). Derived
fields never overwrite values the file itself committed.

Usage as a module:   from sweep_schema import load_sweep
Usage as a CLI:      python3 tools/sweep_schema.py FILE...   (prints the
normalized gate fields per file, one JSON line each)
"""
import json
import sys


def normalize(d):
    """Normalize a parsed Bench detail/stdout dict in place; returns it."""
    if "ratio_match" not in d and "ratio_context" in d:
        d["ratio_match"] = d["ratio_context"]
    d.setdefault("ratio_match", None)
    if "flag_reasons" not in d:
        # Pre-split files: the only flag leg that can be reconstructed
        # without the signature maps is the spread one.
        reasons = []
        if d.get("calib_spread", -1.0) >= 1.3:
            reasons.append("spread")
        if d.get("window_flag") and not reasons:
            reasons.append("ratio")
        d["flag_reasons"] = reasons
    if "anchor_eligible" not in d:
        d["anchor_eligible"] = (
            not d["flag_reasons"] and d["ratio_match"] == "idle")
    return d


def load_sweep(path):
    with open(path) as f:
        return normalize(json.load(f))


if __name__ == "__main__":
    GATE = ("value", "n_queries", "failed", "calib_median",
            "calib_scan_median", "calib_spread", "scan_stage_ratio",
            "scan_branches", "ratio_match", "window_flag",
            "flag_reasons", "anchor_eligible")
    for p in sys.argv[1:]:
        d = load_sweep(p)
        print(json.dumps({"file": p, **{k: d.get(k) for k in GATE}}))
