#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py [sfdir] [outdir] [only_query ...]
Run AFTER `sbt "runMain graft.Verify <sfdir> <outdir>"`.
Both sides are round-tripped through DuckDB -> pandas so value
representations normalize identically; columns sorted by name, rows sorted
by all columns, then exact string compare (the driver hashes the same view).
"""
import sys, json
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results, bad = {}, []
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        sp = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        du = con.execute(oracle[name]).fetchdf()
        # dtype audit: the DRIVER's hash is type-sensitive for DECIMAL
        # widths and HUGEINT (round-1 q1_agg/q_lookup_join failed with
        # string-identical values), while integer-width-only differences
        # (len() BIGINT vs Spark size INT) provably pass. Flag the fatal
        # classes here — the string-compare below cannot see them.
        INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
        sp_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()}
        du_t = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {oracle[name]}").fetchall()}
        type_bad = [
            f"{c}: spark={sp_t[c]} oracle={du_t[c]}"
            for c in set(sp_t) & set(du_t)
            if sp_t[c] != du_t[c] and not (sp_t[c] in INTS and du_t[c] in INTS)]
        if type_bad:
            print(f"--- {name} FATAL type mismatches: {type_bad}")
        sp, du = sp[sorted(sp.columns)], du[sorted(du.columns)]
        schema = list(sp.columns) == list(du.columns) and not type_bad
        sp2 = sp.astype(str).sort_values(by=list(sp.columns)).reset_index(drop=True)
        du2 = du.astype(str).sort_values(by=list(du.columns)).reset_index(drop=True)
        match = schema and len(sp2) == len(du2) and sp2.equals(du2)
        results[name] = f"rows={len(sp)}/{len(du)} schema={schema} match={match}"
        if not match:
            bad.append(name)
            if schema and len(sp2) == len(du2):
                diff = (sp2 != du2).any(axis=1)
                print(f"--- {name} first diffs (spark | oracle):")
                print(sp2[diff].head(3).to_string())
                print(du2[diff].head(3).to_string())
            elif not schema:
                print(f"--- {name} columns: spark={list(sp.columns)} oracle={list(du.columns)}")
    except Exception as e:
        results[name] = f"ERR {str(e)[:300]}"
        bad.append(name)

for k in sorted(results):
    print(("FAIL " if k in bad else "ok   ") + k + "  " + results[k])
print(f"\n{len(results) - len(bad)}/{len(results)} match; FAIL: {bad if bad else 'none'}")
sys.exit(1 if bad else 0)
