#!/usr/bin/env python3
"""Dev-loop replica of the judge's oracle-suite timing: run every oracle
SQL from a graft.Verify dump dir in DuckDB (32 threads, min-of-N) and —
when given a Bench JSON line — print the per-query Spark/oracle ratio
table sorted worst-first, so perf work targets real gaps instead of
guesses.

Usage: bench_oracle.py <sfDir> <verifyOutDir> [benchJson] [rounds]

Queries whose oracle is a relational *derivation* of a verb/stream
harness (q_table_*, q_stream_*, q_jsonl_*, *_persist) time the
derivation, not the harness work — their ratios are expected to be
large and are marked "harness".
"""
import sys, os, json, time
import duckdb

sfdir = sys.argv[1]
outdir = sys.argv[2]
bench_json = sys.argv[3] if len(sys.argv) > 3 else None
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2

HARNESS = ("q_table_", "q_stream_", "q_jsonl_", "q_arrow_", "q_kafka_",
           "q_catalog_lifecycle", "q_log_insert", "q_log_evolve",
           # skipping rows: Spark side exports the corpus to an arrow
           # tree (a write job) before the pruned read; the oracle runs
           # only the final SELECT
           "q_bloom_lookup", "q_string_prune",
           "dedup_decontam_persist", "dedup_crosscorpus_persist",
           "dedup_index_lifecycle", "dedup_winnow_lifecycle",
           "sim_pq_lifecycle", "sim_ivf_lifecycle",
           "sim_pq_incremental", "sim_ivf_incremental",
           "dedup_ingest_chain", "text_rarity_incremental",
           "q_admission_pipeline")

con = duckdb.connect()
con.execute("SET threads=32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = {}
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(rounds):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"ORA-ERR {name}: {e}")
            best = -1
            break
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    times[name] = best

spark = {}
if bench_json:
    b = json.load(open(bench_json))
    spark = b.get("queries", b)

total_o = sum(v for v in times.values() if v > 0)
print(f"oracle suite total: {total_o:.1f} s over {len(times)} queries "
      f"(min of {rounds})")
if spark:
    rows = []
    for name, ot in times.items():
        st = spark.get(name)
        if st is None or ot <= 0:
            continue
        tag = "harness" if name.startswith(HARNESS) else ""
        rows.append((st / ot if ot > 0 else float("inf"), name, st, ot, tag))
    rows.sort(reverse=True)
    print(f"{'ratio':>8} {'query':<28} {'spark':>8} {'oracle':>8}")
    for r, name, st, ot, tag in rows:
        print(f"{r:8.2f} {name:<28} {st:8.2f} {ot:8.3f}  {tag}")
    # aggregate over the INTERSECTION only: a query missing from the
    # bench JSON (failed) or the oracle must not count on one side
    tot_s = sum(x[2] for x in rows)
    tot_o = sum(x[3] for x in rows)
    dropped = (set(times) | set(spark)) - {x[1] for x in rows}
    if dropped:
        print(f"EXCLUDED from aggregate (one-sided): {sorted(dropped)}")
    print(f"suite aggregate over {len(rows)} shared queries: "
          f"spark {tot_s:.1f} s / oracle {tot_o:.1f} s "
          f"= {tot_s / tot_o:.2f}x")
else:
    for name, ot in sorted(times.items()):
        print(f"{ot:8.3f} {name}")
