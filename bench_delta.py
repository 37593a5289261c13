#!/usr/bin/env python3
"""Per-query bench regression report: diff two bench.py JSON outputs.

Usage:
    python bench.py > /tmp/bench_now.json
    python bench_delta.py BENCH_r01.json /tmp/bench_now.json [-o BENCH_DELTA.md]

Prints a markdown table (old, new, delta, ratio) per query plus totals, so a
regression in one query is visible even when the headline total improves.
Queries present in only one file are listed as added/removed rather than
silently dropped.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r{N}.json wrapper (bench output under the "parsed" key).

    Round-7 bench lines carry only scalars plus a ``queries_file`` pointer;
    when present, the per-query warm/cold dicts are merged in from that
    side file (resolved relative to ``path``'s directory)."""
    import os

    with open(path) as f:
        text = f.read()
    obj = None
    try:
        parsed = json.loads(text)
        obj = parsed.get("parsed", parsed) if isinstance(parsed, dict) else parsed
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith('{"metric"'):
                obj = json.loads(line)
                break
    if obj is None:
        raise SystemExit(f"no bench JSON found in {path}")
    if "queries" not in obj and obj.get("queries_file"):
        base = os.path.dirname(os.path.abspath(path))
        # Provenance (round-9 VERDICT #1): the mutable BENCH_QUERIES.json is
        # overwritten every run, so diffing two BENCH_r{N}.json wrappers
        # through it compared one snapshot against itself. Prefer the
        # round-stamped immutable copy BENCH_QUERIES_r{N}.json matching the
        # wrapper's round number; fall back to the pointer only when no
        # stamped file exists, and say so.
        import re

        candidates = []
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(path))
        if m:
            candidates.append(f"BENCH_QUERIES_r{int(m.group(1)):02d}.json")
        candidates.append(obj["queries_file"])
        for name in candidates:
            side = os.path.join(base, name)
            try:
                with open(side) as f:
                    sideobj = json.load(f)
            except OSError:
                continue
            if m and name == obj["queries_file"]:
                print(
                    f"WARNING: no round-stamped side file for {path}; "
                    f"falling back to mutable {name} — timings may belong "
                    "to a later round.",
                    file=sys.stderr,
                )
            obj = {**obj,
                   "queries": sideobj.get("queries", {}),
                   "queries_cold": sideobj.get("queries_cold", {}),
                   "queries_side_file": name}
            break
    return obj


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("-o", "--out", help="also write the table to this file")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    # Like-for-like guard (round-2 ADVICE): never compare a single-run file
    # against a min-of-2 file on the min numbers — the methodology change
    # masquerades as a speedup. If the old file is single-run and the new
    # one carries per-query cold timings, compare cold-vs-cold instead.
    o_agg, n_agg = old.get("agg", "single-run"), new.get("agg", "single-run")
    note = ""
    # Context guard (round-10 VERDICT #2): numbers from a loaded driver box
    # and a quiet builder-close run are not comparable — r10's
    # alto_parse_2k "regression" (0.698 -> 1.033) was pure run-condition
    # noise. When contexts differ (or either is unknown), the diff is
    # still printed but regressions are NOT flagged, and the header says
    # why.
    o_ctx = old.get("context", "unknown")
    n_ctx = new.get("context", "unknown")
    cross_context = o_ctx != n_ctx or "unknown" in (o_ctx, n_ctx)
    ctx_note = (
        f"CROSS-CONTEXT diff (old={o_ctx}, new={n_ctx}): run conditions "
        "differ; ratios include run-condition noise and regressions are "
        "NOT flagged. Re-run both sides in the same context to adjudicate."
        if cross_context
        else ""
    )
    if o_agg != n_agg:
        if o_agg == "single-run" and new.get("queries_cold"):
            nq = new["queries_cold"]
            n_agg = "cold (single-pass)"
            note = (
                "Methodology differs (old=single-run, new=min-of-2): "
                "comparing old single-run vs new COLD per-query timings."
            )
        else:
            note = (
                f"WARNING: methodology mismatch (old={o_agg}, new={n_agg}) "
                "and no like-for-like timings available — ratios conflate "
                "the protocol change with real deltas."
            )

    lines = [
        f"# Bench delta: {args.old} -> {args.new}",
        "",
        f"Totals: {old.get('value')}s -> "
        f"{new.get('cold_sec') if n_agg.startswith('cold') else new.get('value')}s "
        f"({len(oq)} -> {len(nq)} queries; sf={new.get('sf')}, "
        f"agg: {o_agg} -> {n_agg}; context: {o_ctx} -> {n_ctx})",
        *(["", note] if note else []),
        *(["", ctx_note] if ctx_note else []),
        "",
        "| query | old s | new s | delta s | ratio |",
        "|---|---|---|---|---|",
    ]
    regressions = 0
    for name in sorted(set(oq) | set(nq)):
        if name not in nq:
            lines.append(f"| {name} | {oq[name]:.3f} | — | — | removed |")
            continue
        if name not in oq:
            lines.append(f"| {name} | — | {nq[name]:.3f} | — | added |")
            continue
        d = nq[name] - oq[name]
        r = nq[name] / oq[name] if oq[name] else float("inf")
        flag = " ⚠" if r > 1.25 and d > 0.5 and not cross_context else ""
        if flag:
            regressions += 1
        lines.append(
            f"| {name} | {oq[name]:.3f} | {nq[name]:.3f} | {d:+.3f} | {r:.2f}x{flag} |"
        )
    lines += [
        "",
        f"Flagged regressions (>1.25x and >0.5s): {regressions}"
        + (" [suppressed: cross-context]" if cross_context else ""),
    ]

    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    main()
