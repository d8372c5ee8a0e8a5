#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows compared exactly).

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json
import subprocess
import sys
import glob
import os

import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT = ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out"
# --only=a,b restricts both the Verify run and the compare to the
# named queries (local iteration; the driver never passes it)
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a[len("--only="):].split(","))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

CP = "/opt/spark/jars/*:target/scala-2.13/classes"
ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio", "java.base/java.util",
          "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
          "java.base/sun.nio.cs", "java.base/sun.security.action",
          "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]


def table_bytes(sfdir):
    return sum(os.path.getsize(p)
               for p in glob.glob(os.path.join(sfdir, "*.parquet")))


def verify_heap(sfdir, cpus):
    """Heap sized by SF and thread count, not lore: the r13 sf1 gate
    OOM-killed an -Xmx8g/32-thread Verify on pipeline_funnel (~250
    MB/thread); real executor sizing is 1.5-4 GB/core at that scale.
    Rule: >= 2 GB + 300x the on-disk parquet footprint (snappy parquet
    decompresses ~5-10x and the materialized funnels hold several
    shuffled copies; calibrated on the r13 sf1 tier, ~160 MB on disk
    needing ~48 GB), plus a 1.5 GB/thread floor once the tier stops
    being toy-sized (>= 100 MB on disk), capped at 48 GB. Override:
    GRAFT_VERIFY_XMX=48g."""
    override = os.environ.get("GRAFT_VERIFY_XMX")
    if override:
        return override
    gb = table_bytes(sfdir) / (1 << 30)
    need = 2.0 + 300.0 * gb
    if gb >= 0.1:
        need = max(need, 1.5 * cpus)
    # cap by what the box can actually give (80% of RAM), and SAY SO:
    # a tier big enough to hit the cap is exactly the case where the
    # r13 OOM-kill happened silently under a too-small fixed heap
    try:
        with open("/proc/meminfo") as f:
            ram_gb = int(f.readline().split()[1]) / (1 << 20)
    except OSError:
        ram_gb = 60.0
    cap = int(ram_gb * 0.8)
    want = max(int(need + 0.999), 8)
    if want > cap:
        print(f"[check] WARNING: verify heap clamped to {cap}g "
              f"(rule wants {want}g for this tier); Verify may OOM — "
              f"reduce SPARK_GRAFT_CPUS or set GRAFT_VERIFY_XMX")
    return f"{min(want, cap)}g"


def run_verify():
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    xmx = verify_heap(SF, int(env["SPARK_GRAFT_CPUS"]))
    cmd = (["java"] + ADD_OPENS +
           [f"-Xmx{xmx}", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", CP, "graft.Verify", SF, OUT] +
           ([",".join(sorted(ONLY))] if ONLY else []))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo")
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-6000:])
        sys.exit(1)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    # optional memory cap (e.g. "90GB"): DuckDB then SPILLS heavy
    # oracle joins to disk instead of being OOM-killed — needed for
    # the quadratic dedup-family oracles at sf>=1
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # `only`-filtered GenSf tiers (e.g. heaps documents+embeddings)
        # carry a subset of the tables; register what exists
        if os.path.exists(f"{SF}/{t}.parquet"):
            # GRAFT_GENSF_PARTS>1 tiers write <t>.parquet as a normal
            # multi-part parquet DIRECTORY; DuckDB needs the glob form
            p = f"{SF}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{OUT}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    dirs = sorted(set(
        d for d in os.listdir(OUT)
        if os.path.isdir(os.path.join(OUT, d))) | set(oracle))
    if ONLY:
        dirs = [d for d in dirs if d in ONLY]
    for name in dirs:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{files[0]}'")
        gcols, grows = norm(got.fetchall(), got.columns)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(grows)} rows)")
            continue
        try:
            want = con.sql(oracle[name])
            wcols, wrows = norm(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rowcount {len(grows)} vs {len(wrows)}")
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(grows, wrows) if g != w]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; "
                  f"cols={gcols}; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(dirs) - n_pass - n_fail} skipped (no oracle)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
