#!/usr/bin/env python3
"""Render BASELINE.md's measured table from the committed artifacts/ JSON.

Usage: python3 tools/baseline_table.py [round_suffix]   (default: r05)
Reads artifacts/BENCH_{sf01,sf1,sf10,sf100}_<round>.json and
artifacts/BASELINE_duckdb_{...}_<round>.json (missing files → column
omitted) and prints the markdown table + comparable totals, so the table in
BASELINE.md is a paste of this output, never hand-edited numbers.
"""
import json, os, sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
A = os.path.join(HERE, "artifacts")

def load(name):
    p = os.path.join(A, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)

def ok(v):
    # Bench.scala records -1.0 for a query that FAILED; a failure must drop
    # the query from the comparable set, not subtract a phantom second.
    return isinstance(v, (int, float)) and not isinstance(v, bool) and v > 0

def fmt(v):
    if v is None:
        return "no-oracle"
    if isinstance(v, str):  # "TIMEOUT>300.0s" / "KILLED (OOM)" / "ERROR: ..."
        if v.startswith("TIMEOUT"):
            return "**timeout >300 s**"
        if "OOM" in v or "No space left" in v:
            return "**forfeit (OOM/disk)**"
        return "**error**"
    if not ok(v):
        return "**failed**"
    return f"{v:.2f}"

def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r05"
    sfs = [s for s in ["sf01", "sf1", "sf10", "sf100"]
           if load(f"BENCH_{s}_{rnd}.json") and load(f"BASELINE_duckdb_{s}_{rnd}.json")]
    bench = {s: load(f"BENCH_{s}_{rnd}.json")["queries"] for s in sfs}
    duck = {s: load(f"BASELINE_duckdb_{s}_{rnd}.json")["queries"] for s in sfs}
    queries = list(bench[sfs[0]].keys())

    # comparable set: queries BOTH engines complete at EVERY scale factor —
    # one consistent set, so totals are comparable across the SF columns
    # (embed_cos finishes at sf0.1 but times out beyond; minhash has no
    # oracle — both excluded everywhere rather than per-column)
    comparable = [q for q in queries if all(
        ok(bench[s].get(q)) and ok(duck[s].get(q)) for s in sfs)]

    hdr = "| query |" + "".join(f" graft {s} | duckdb {s} |" for s in sfs)
    sep = "|---|" + "---|---|" * len(sfs)
    print(hdr)
    print(sep)
    comp = {s: [0.0, 0.0] for s in sfs}
    for q in queries:
        cells = []
        for s in sfs:
            g, d = bench[s].get(q), duck[s].get(q)
            cells += [fmt(g), fmt(d)]
            if q in comparable:
                comp[s][0] += g
                comp[s][1] += d
        print(f"| {q} | " + " | ".join(cells) + " |")
    tot = f"| **comparable total ({len(comparable)})** |" + "".join(
        f" **{comp[s][0]:.2f}** | **{comp[s][1]:.2f}** |" for s in sfs)
    print(tot)
    for s in sfs:
        print(f"ratio {s}: {comp[s][0] / comp[s][1]:.2f}x", file=sys.stderr)

if __name__ == "__main__":
    main()
