#!/usr/bin/env python3
"""Build the PLANS.md plan-audit table from graft.tools.Explain dumps.

Usage: plans_table.py <aqe_dump> <noaqe_dump> <bench_json>

Counts per query (from the AQE-on dump): shuffle Exchange nodes,
broadcast joins, sort-merge + shuffled-hash joins, parquet scans, scans
with non-empty PushedFilters; from the AQE-off dump: distinct
WholeStageCodegen span ids. Joins with the per-query MEDIAN seconds
from the bench artifact's one-line JSON.
"""
import json, re, sys


def sections(path):
    out, name, buf = {}, None, []
    for line in open(path):
        line = re.sub(r"^\[(info|error)\] ", "", line)  # sbt prefixes
        m = re.match(r"^===== (\S+) =====", line)
        if m:
            if name:
                out[name] = "".join(buf)
            name, buf = m.group(1), []
        elif name:
            buf.append(line)  # already prefix-stripped
    if name:
        out[name] = "".join(buf)
    return out


def count_plan(text):
    # formatted explain prints each node in the tree AND in the detail
    # list; count only the "(<id>) <Operator>" detail lines
    ex = len(re.findall(r"^\(\d+\) Exchange\b", text, re.M))
    bj = len(re.findall(r"^\(\d+\) Broadcast(?:Hash|NestedLoop)Join", text, re.M))
    smj = len(re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", text, re.M))
    scans = len(re.findall(r"^\(\d+\) Scan parquet", text, re.M))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", text))
    return ex, bj, smj, scans, pushed


def codegen_spans(text):
    # formatted mode annotates detail lines with [codegen id : N]
    return len(set(re.findall(r"codegen id : (\d+)", text)))


def main():
    aqe, noaqe, bench_path = sys.argv[1], sys.argv[2], sys.argv[3]
    bench = None
    for line in open(bench_path):
        line = line.strip()
        i = line.find('{"metric"')
        if i >= 0:
            doc = json.loads(line[i:])
            # prefer the full-name detail record over the compact
            # short-key headline (round 5+ emits both)
            if bench is None or doc.get("metric") == "bench_detail":
                bench = doc
    qsec = bench["queries"] if bench else {}
    if bench is None:
        bench = {}  # degraded table: '-' timings, reps column reads 1
    a, n = sections(aqe), sections(noaqe)
    print("| query | exchanges | bj | smj/shj | scans | pushed | codegen spans | sf0.1 sec (median of %d) |" % bench.get("reps", 1))
    print("|---|---|---|---|---|---|---|---|")
    total = 0.0
    for q in sorted(a):
        ex, bj, smj, scans, pushed = count_plan(a[q])
        spans = codegen_spans(n.get(q, ""))
        sec = qsec.get(q)
        total += sec or 0.0
        secs = f"{sec:.2f}" if sec is not None else "-"
        print(f"| {q} | {ex} | {bj} | {smj} | {scans} | {pushed} | {spans} | {secs} |")
    print(f"\nTotal (sum of medians): {total:.1f} s")


if __name__ == "__main__":
    main()
