#!/usr/bin/env python3
"""One-invocation sharded DuckDB oracle replay (r12 verdict ask #8).

The r12 organic-sf1 replay was hand-sharded (3 parallel check.py
processes) and still needed 4 solo 90 GB re-runs: the known
spill-heavy oracles hit disk contention when any two of them — or one
of them plus a busy shard — spilled at once. This driver makes the
schedule explicit and single-invocation:

  phase 1: the light queries split round-robin across N parallel
           check.py shards (per-shard DuckDB memory/thread caps);
  phase 2: the spill-heavy oracles run STRICTLY ONE AT A TIME with a
           large memory limit, so at most one big spiller owns the
           disk at any moment.

Usage: run_oracle_replay.py <sf_dir> <out_dir> <log_path> [n_shards]
Env:
  GRAFT_HEAVY            comma list overriding the default heavy set
  GRAFT_SHARD_MEM        per-shard DuckDB cap        (default 24GB)
  GRAFT_HEAVY_MEM        solo-pass DuckDB cap        (default 90GB)
  GRAFT_SHARD_THREADS    per-shard DuckDB threads    (default 10)
The combined log is board_artifact.py-compatible; exit 1 on any FAIL.
"""
import os
import subprocess
import sys
import threading

# Oracles measured spill-heavy on the organic-sf1/sf10 replays: the
# two 90 GB k-core/weak-ties supports (r11 env casualties), the two
# path-explosion heavies (87M/86M output rows), and the embedding
# pair rerank (74 GB RSS before the DuckDB memory cap existed).
DEFAULT_HEAVY = [
    "graph_coreness", "graph_weakties", "call_paths_down",
    "call_chain_up", "dedup_embedding",
]


def run_check(sf_dir, out_dir, names, mem, threads, log_lines, tag):
    env = dict(os.environ)
    env["GRAFT_VERIFY_ONLY"] = ",".join(names)
    env["GRAFT_DUCKDB_MEMLIMIT"] = mem
    env["GRAFT_SCALE_ORACLES"] = "1"
    if threads:
        env["GRAFT_DUCKDB_THREADS"] = str(threads)
    else:
        # the solo heavy pass owns the machine: an inherited shard
        # thread cap must not leak into it
        env.pop("GRAFT_DUCKDB_THREADS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
         sf_dir, out_dir],
        env=env, capture_output=True, text=True)
    out = p.stdout + ("\n" + p.stderr if p.returncode and p.stderr else "")
    log_lines.append((tag, out))
    return p.returncode


def spill_headroom_gb():
    """Usable GB on the filesystem the DuckDB shards will spill to."""
    import shutil
    spill_root = os.environ.get("GRAFT_DUCKDB_TMPDIR", "/tmp/duckdb_spill")
    probe = spill_root
    while not os.path.exists(probe):
        probe = os.path.dirname(probe) or "/"
    return shutil.disk_usage(probe).free / (1 << 30)


def main(sf_dir, out_dir, log_path, n_shards=3):
    # SPILL HEADROOM GATE (r14 verdict ask #3): the r14 sf1 replay's
    # only fails were oracle-side "disk full" — a co-scheduled Spark
    # dump shared the spill filesystem mid-invocation. Refuse to start
    # (rather than fail 80 minutes in) when the spill disk can't hold
    # a heavy oracle's worst observed spill (~74 GB) plus margin. Do
    # NOT co-schedule Spark dumps or boards with a replay; override
    # via GRAFT_MIN_SPILL_GB for small-SF replays.
    min_gb = float(os.environ.get("GRAFT_MIN_SPILL_GB", "40"))
    free_gb = spill_headroom_gb()
    if free_gb < min_gb:
        print(f"FAIL replay: spill disk headroom {free_gb:.1f} GB < "
              f"required {min_gb:.0f} GB — free disk or lower "
              f"GRAFT_MIN_SPILL_GB before launching shards")
        return 1
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # COMPLETENESS (r13 advice): the query list comes from listing
    # out_dir, and check.py's GRAFT_VERIFY_ONLY mode skips its
    # oracle-present-but-no-result pass — an oracle whose output dir
    # was never written would silently vanish from every shard and the
    # replay would exit 0. Fail them here instead.
    import json
    manifest = os.path.join(out_dir, "oracle_sql.json")
    # (r14 advice) a legacy/partial output dir without the manifest
    # must FAIL loudly, not die in an unhandled traceback before any
    # shard runs
    if not os.path.exists(manifest):
        print(f"FAIL replay: {manifest} missing — out_dir is not a "
              "complete graft.Verify dump")
        return 1
    with open(manifest) as f:
        expected = sorted(json.load(f).keys())
    missing = [n for n in expected if n not in set(names)]
    heavy_set = [h for h in
                 os.environ.get("GRAFT_HEAVY", ",".join(DEFAULT_HEAVY)).split(",")
                 if h]
    heavy = [n for n in names if n in heavy_set]
    light = [n for n in names if n not in heavy_set]
    shard_mem = os.environ.get("GRAFT_SHARD_MEM", "24GB")
    heavy_mem = os.environ.get("GRAFT_HEAVY_MEM", "90GB")
    shard_thr = os.environ.get("GRAFT_SHARD_THREADS", "10")
    shards = [light[i::n_shards] for i in range(n_shards)]
    shards = [s for s in shards if s]
    log_lines, rcs = [], []
    threads = [
        threading.Thread(target=lambda s=s, i=i: rcs.append(
            run_check(sf_dir, out_dir, s, shard_mem, shard_thr,
                      log_lines, f"shard{i}")))
        for i, s in enumerate(shards)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # phase 2: one spiller at a time, whole machine's worth of memory
    for h in heavy:
        rcs.append(run_check(sf_dir, out_dir, [h], heavy_mem, None,
                             log_lines, f"heavy:{h}"))
    with open(log_path, "w") as f:
        for n in missing:
            f.write(f"FAIL {n}: oracle present but no result written\n")
    with open(log_path, "a") as f:
        for tag, out in log_lines:
            f.write(f"---- {tag} ----\n{out}\n")
    n_pass = sum(ln.startswith("PASS") for _, o in log_lines
                 for ln in o.splitlines())
    n_fail = len(missing) + sum(ln.startswith("FAIL") for _, o in log_lines
                                for ln in o.splitlines())
    print(f"replay: {n_pass} pass, {n_fail} fail "
          f"({len(missing)} missing results; "
          f"{len(shards)} shards + {len(heavy)} serialized heavies); "
          f"log: {log_path}")
    return 1 if (n_fail or any(rcs)) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 3))
