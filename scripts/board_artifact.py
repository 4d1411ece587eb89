#!/usr/bin/env python3
"""Convert a scripts/check.py log into a committed JSON artifact:
per-query pass/fail + row counts, the scale factor dir, and totals.
Usage: board_artifact.py <check_log> <sf_dir> <out_json> [note]"""
import json, re, sys


def main(log_path, sf_dir, out_path, note=""):
    queries, fails = {}, {}
    for ln in open(log_path):
        m = re.match(r"PASS (\S+)( \[scale-digest\])? \((\d+) rows\)", ln)
        if m:
            queries[m.group(1)] = {"pass": True, "rows": int(m.group(3)),
                                   **({"form": "scale-digest"} if m.group(2) else {})}
            continue
        m = re.match(r"FAIL (\S+)( \[scale-digest\])?: (.*)", ln)
        if m:
            fails[m.group(1)] = m.group(3).strip()
            queries[m.group(1)] = {"pass": False, "err": m.group(3).strip(),
                                   **({"form": "scale-digest"} if m.group(2) else {})}
    art = {
        "sf_dir": sf_dir,
        "n_queries": len(queries),
        "n_pass": sum(1 for v in queries.values() if v["pass"]),
        "n_fail": len(fails),
        "fails": fails,
        "queries": queries,
        "note": note,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"{art['n_pass']}/{art['n_queries']} pass -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "")
