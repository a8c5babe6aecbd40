#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r16.md per-query checklist table from two
bench snapshots (opening vs closing) plus a notes map.

Usage: python3 tools/opt_checklist.py BENCH_r16_open.json BENCH_FULL.json
Prints a markdown table: query | open total/serve | close total/serve | note.
"""
import json
import sys

NOTES = {}  # filled by the caller via edits below or inline

def main(before_path: str, after_path: str) -> None:
    a = json.load(open(before_path))
    b = json.load(open(after_path))
    notes = json.load(open("tools/opt_notes.json"))
    default = notes.pop("_default_", "")
    fams = notes.pop("_families_", {})
    rows = []
    for q in a["queries"]:
        note = notes.get(q)
        if note is None:
            note = default
            for prefix, famnote in fams.items():
                if q in famnote.get("queries", []):
                    note = famnote["note"]
                    break
        rows.append((q, a["queries"][q], a["serve_sec"][q],
                     b["queries"].get(q, -1), b["serve_sec"].get(q, -1),
                     note))
    print("| query | open tot | open srv | close tot | close srv | disposition |")
    print("|---|---|---|---|---|---|")
    for q, at, asv, bt, bsv, note in rows:
        print(f"| {q} | {at:.2f} | {asv:.2f} | {bt:.2f} | {bsv:.2f} | {note} |")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
