#!/usr/bin/env python3
"""Dev-only: convert a tools/check.py stdout capture into the
committed CORRECTNESS_sf1.0_r{N}.json shape (match flag + row count
per query, plus the pass/total header fields).

Usage: python3 tools/check_to_json.py <check_output.txt> <generated-note> > OUT.json
"""
import json, re, sys


def main():
    txt = open(sys.argv[1]).read()
    note = sys.argv[2] if len(sys.argv) > 2 else ""
    queries = {}
    # tolerant spacing/suffix (ADVICE r13): '^ok   ' hard-coded exactly
    # three spaces and the FAIL regex required trailing text, so a bare
    # 'FAIL <name>' line silently vanished from the JSON — overstating
    # oracled_pass/oracled_total fidelity
    for m in re.finditer(r"^ok\s+(\S+) \((\d+) rows\)$", txt, re.M):
        queries[m.group(1)] = {"match": True, "rows": int(m.group(2))}
    for m in re.finditer(r"^FAIL (\S+?):?(?:\s.*)?$", txt, re.M):
        name = m.group(1).rstrip(":")
        name = re.sub(r"\(.*", "", name)
        queries.setdefault(name, {"match": False, "rows": -1})
    n_ok = sum(1 for q in queries.values() if q["match"])
    out = {
        "generated": note,
        "oracled_pass": n_ok,
        "oracled_total": len(queries),
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
