#!/usr/bin/env python3
"""Chunked replay of the vote-grid oracle family (VERDICT r8 task 4): the
single-statement DuckDB replays of q336/q348/q355/q356/q358/q361/q364
explode on the (documents x grams x hex-chars) fingerprint grid at 100x
(~2-8 B intermediate rows, past the 128 GiB sandbox even out-of-core).
The grid is PER-DOCUMENT, so it partitions cleanly on doc_id % N: this
runner executes the stage list graft.Verify dumps to oracle_chunked.json -
for each chunked stage it materializes the fingerprint table in N
doc-modulo passes (CREATE then INSERT ... UNION semantics), runs any plain
stages (pair sets per modality), then checksums the final select against
the Spark parquet dump with validate_scale.py's commutative checksum
(count + sum of md5-prefix HUGEINTs over canonicalized rows).

Usage: validate_grid_chunked.py <sfdir> <outdir> <nchunks> [query...]
       [--isolate]   one subprocess per query (an OOM cannot cascade)
Env:   GRAFT_DUCKDB_MEM / GRAFT_DUCKDB_THREADS as in validate_scale.py.
(assumes <outdir> already holds graft.Verify's parquet dumps +
oracle_chunked.json)
"""
import json, os, shutil, subprocess, sys, time

import duckdb

sfdir, outdir, nchunks = sys.argv[1], sys.argv[2], int(sys.argv[3])
only = [a for a in sys.argv[4:] if a != "--isolate"]
isolate = "--isolate" in sys.argv[4:]

spec = json.load(open(f"{outdir}/oracle_chunked.json"))
names = only or sorted(spec)

if isolate:
    npass = nfail = 0
    for name in names:
        r = subprocess.run(
            [sys.executable, __file__, sfdir, outdir, str(nchunks), name],
            capture_output=True, text=True)
        out = (r.stdout + r.stderr).strip()
        for line in out.splitlines():
            if line.startswith(("PASS", "FAIL", "[chunk]")):
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


def fresh_connection(dbpath):
    if os.path.exists(dbpath):
        os.remove(dbpath)
    c = duckdb.connect(dbpath)  # file-backed: materialized tables can page
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


def canon_cols(desc):
    cols = []
    for cname, typ in sorted((d[0], str(d[1])) for d in desc):
        q = f'"{cname}"'
        if typ == "FLOAT":
            cols.append(f"coalesce(CAST(CAST({q} AS DOUBLE) AS VARCHAR), 'NULL')")
        else:
            cols.append(f"coalesce(CAST({q} AS VARCHAR), 'NULL')")
    return cols


def checksum(con, rel_sql):
    desc = con.execute(f"SELECT * FROM ({rel_sql}) LIMIT 0").description
    row = " || '|' || ".join(canon_cols(desc))
    r = con.execute(
        f"SELECT count(*), coalesce(sum(CAST(CAST('0x' || substr(md5({row}), 1, 16) AS UBIGINT) AS HUGEINT)), 0) "
        f"FROM ({rel_sql})").fetchone()
    return r[0], r[1], sorted(d[0] for d in desc)


fails, passes = [], []
for name in names:
    if name not in spec:
        fails.append((name, "no chunked oracle entry")); continue
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output")); continue
    dbpath = f"{outdir}/chunked_{name}.db"
    con = fresh_connection(dbpath)
    try:
        for st in spec[name]["stages"]:
            tbl, sql = st["table"], st["sql"]
            con.execute(f"DROP TABLE IF EXISTS {tbl}")
            if st["chunked"]:
                t0 = time.time()
                for c in range(nchunks):
                    csql = sql.replace("<<NCHUNKS>>", str(nchunks)) \
                              .replace("<<CHUNK>>", str(c))
                    verb = f"CREATE TABLE {tbl} AS" if c == 0 else f"INSERT INTO {tbl}"
                    con.execute(f"{verb} {csql}")
                n = con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
                print(f"[chunk] {name}: {tbl} materialized in {nchunks} passes, "
                      f"{n} rows, {time.time()-t0:.1f}s", flush=True)
            else:
                t0 = time.time()
                con.execute(f"CREATE TABLE {tbl} AS {sql}")
                n = con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0]
                print(f"[chunk] {name}: {tbl} ({n} rows, {time.time()-t0:.1f}s)",
                      flush=True)
        t0 = time.time()
        ecount, esum, ecols = checksum(con, spec[name]["final"])
        gcount, gsum, gcols = checksum(con, f"SELECT * FROM '{qdir}/*.parquet'")
        if gcols != ecols:
            fails.append((name, f"schema: spark={gcols} oracle={ecols}"))
        elif (gcount, gsum) != (ecount, esum):
            fails.append((name, f"spark count={gcount} sum={gsum} vs "
                                f"oracle count={ecount} sum={esum}"))
        else:
            passes.append((name, gcount))
            print(f"[chunk] {name}: final compare {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
    finally:
        try:
            con.close()
        except Exception:
            pass
        for p in (dbpath, dbpath + ".wal"):
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(f"{outdir}/duckdb_spill.tmp", ignore_errors=True)

for n, c in passes:
    print(f"PASS {n} ({c} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
