#!/usr/bin/env python3
"""Round-over-round bench triage: compare two bench artifacts.

Usage: bench_diff.py <old> <new> [ratio_threshold=1.5] [abs_threshold=0.3]

Accepts either the driver's BENCH_r{N}.json wrapper (JSON with a "tail"
string containing the one-line metric JSON) or the raw one-line output.
Flags queries whose per-query seconds moved more than BOTH thresholds
in either direction; when the artifact carries "runs" (round 4+), the
run spread is printed so box noise is distinguishable from real
regressions (a move inside the other side's min-max spread is noise).
"""
import json, re, sys


def norm(queries):
    """Key per-query dicts by their qNN/xNN/bNN prefix: round-5 headlines
    use short keys to fit the driver's 2000-char tail window, while
    r1-r4 artifacts carry full names. A None value (failed query) is
    dropped — there is no timing to compare."""
    out = {}
    for k, v in (queries or {}).items():
        m = re.match(r"^([qxb]\d+)", k)
        if v is not None:
            out[m.group(1) if m else k] = v
    return out


def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        text = doc.get("tail", "") if isinstance(doc, dict) else ""
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    raise SystemExit(f"no metric line found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio_t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_t = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    oq = norm({**old.get("queries", {}), **old.get("extras", {})})
    nq = norm({**new.get("queries", {}), **new.get("extras", {})})
    oruns = norm(old.get("runs", {}))
    nruns = norm(new.get("runs", {}))
    # a failed (null-valued) query must read as FAILED, not as suite
    # churn — norm() drops it from the comparison dicts
    for side, doc in (("old", old), ("new", new)):
        for q in doc.get("failed", []) or []:
            print(f"FAILED  {q:34s} (in {side} artifact)")
    flagged = 0
    for q in sorted(set(oq) | set(nq)):
        if q not in oq:
            print(f"NEW     {q:34s}          -> {nq[q]:6.2f}")
            continue
        if q not in nq:
            print(f"REMOVED {q:34s} {oq[q]:6.2f} ->")
            continue
        a, b = oq[q], nq[q]
        ratio = b / a if a > 0 else float("inf")
        if (ratio > ratio_t or ratio < 1 / ratio_t) and abs(b - a) > abs_t:
            flagged += 1
            # the median is trivially inside its OWN runs; noise means
            # the OTHER round's value falls inside this round's spread
            spread = ""
            new_runs = nruns.get(q)
            old_runs = oruns.get(q)
            noise = (new_runs and min(new_runs) <= a <= max(new_runs)) or \
                (old_runs and min(old_runs) <= b <= max(old_runs))
            runs = new_runs or old_runs
            if runs:
                spread = ("  runs=[" + ", ".join(f"{r:.2f}" for r in runs) + "]" +
                          (" (inside run spread: noise?)" if noise else ""))
            print(f"MOVED   {q:34s} {a:6.2f} -> {b:6.2f}  ({ratio:4.2f}x){spread}")
    tot_a = sum(v for k, v in oq.items() if k in nq)
    tot_b = sum(v for k, v in nq.items() if k in oq)
    print(f"\ntotals (shared queries): {tot_a:.1f} -> {tot_b:.1f} s; "
          f"{flagged} flagged of {len(set(oq) & set(nq))} shared")


if __name__ == "__main__":
    main()
