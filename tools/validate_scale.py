#!/usr/bin/env python3
"""Scale-fixture twin of validate.py: same Spark-vs-DuckDB oracle compare,
but ORDER-INDEPENDENT CHECKSUMS computed inside DuckDB instead of python
row sorts — a 10x fixture's largest outputs run to tens of millions of
rows, which the row-level comparator cannot hold.

Per query: row count + a commutative checksum (sum of the first 16 md5 hex
chars of the canonicalized row string, as HUGEINT) on both sides. BOTH
sides are read and formatted by DuckDB (the Spark side from its parquet
dump), so CAST AS VARCHAR is the same shortest-roundtrip formatter for
both and the compare stays exact to the bit, like validate.py's repr()
equality. FLOAT widens to DOUBLE first (exact) so a float32 Spark column
formats identically to the oracle's double arithmetic.

Usage: python3 tools/validate_scale.py <sfdir> <outdir> [query...]
(assumes <outdir> already holds graft.Verify's parquet dumps)
"""
import json, os, subprocess, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = [a for a in sys.argv[3:] if a != "--isolate"]
isolate = "--isolate" in sys.argv[3:]

if isolate:
    # one SUBPROCESS per query: a query that trips DuckDB's memory limit
    # poisons the whole process (the buffer manager is process-global and
    # the failed reservation leaks — after one OOM even duckdb.connect()
    # fails 4 KiB allocations), so at 100x each compare gets its own
    # process and one blowup cannot cascade
    names = only or sorted(json.load(open(f"{outdir}/oracle_sql.json")))
    npass = nfail = 0
    for name in names:
        r = subprocess.run([sys.executable, __file__, sfdir, outdir, name],
                           capture_output=True, text=True)
        out = (r.stdout + r.stderr).strip()
        for line in out.splitlines():
            if line.startswith(("PASS", "FAIL")):
                print(line, flush=True)
        if f"PASS {name}" in out:
            npass += 1
        else:
            nfail += 1
            if f"FAIL {name}" not in out:
                print(f"FAIL {name}: child rc={r.returncode}: "
                      f"{out.splitlines()[-1] if out else 'no output'}", flush=True)
    print(f"\n{npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)

def fresh_connection():
    """A configured connection. 100x oracle replays (q43's 50M-row shingle
    table, q348's 2B-row vote grid) exceed RAM in a pure in-memory
    connection, which cannot spill: give DuckDB a temp dir (enables
    out-of-core joins/aggregates) and drop insertion-order preservation
    (checksums are commutative anyway). GRAFT_DUCKDB_THREADS caps threads
    (peak memory scales with per-thread radix partitions: q43/q38 OOM'd
    at default threads on 128 GiB but complete at 8); GRAFT_DUCKDB_MEM
    caps the buffer pool."""
    c = duckdb.connect()
    c.execute(f"SET temp_directory='{outdir}/duckdb_spill.tmp'")
    c.execute("SET preserve_insertion_order=false")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        c.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        c.execute(f"SET threads={int(thr)}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return c

con = fresh_connection()

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon_cols(desc):
    """Canonicalized per-column string expressions, sorted by column name."""
    cols = []
    for name, typ in sorted((d[0], str(d[1])) for d in desc):
        q = f'"{name}"'
        if typ == "FLOAT":
            cols.append(f"coalesce(CAST(CAST({q} AS DOUBLE) AS VARCHAR), 'NULL')")
        else:
            cols.append(f"coalesce(CAST({q} AS VARCHAR), 'NULL')")
    return cols

def checksum(rel_sql):
    desc = con.execute(f"SELECT * FROM ({rel_sql}) LIMIT 0").description
    cols = canon_cols(desc)
    row = " || '|' || ".join(cols)
    r = con.execute(
        f"SELECT count(*), coalesce(sum(CAST(CAST('0x' || substr(md5({row}), 1, 16) AS UBIGINT) AS HUGEINT)), 0) "
        f"FROM ({rel_sql})").fetchone()
    names = sorted(d[0] for d in desc)
    return r[0], r[1], names

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output")); continue
    try:
        gn, gh, gcols = checksum(f"SELECT * FROM '{qdir}/*.parquet'")
        en, eh, ecols = checksum(sql)
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        # an OOM-killed query leaves the shared connection degraded (its
        # reservation is not fully released; later queries then fail
        # kilobyte allocations) — rebuild so one blowup can't cascade
        try: con.close()
        except Exception: pass
        con = fresh_connection()
        continue
    if gcols != ecols:
        fails.append((name, f"schema: spark={gcols} oracle={ecols}"))
    elif gn != en:
        fails.append((name, f"rows: spark={gn} oracle={en}"))
    elif gh != eh:
        fails.append((name, f"checksum mismatch over {gn} rows"))
    else:
        passes.append((name, gn))

for n, c in passes: print(f"PASS {n} ({c} rows, checksum)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
