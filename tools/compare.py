#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata tables, compare with the Spark parquet dumps
(columns sorted by name, rows sorted by all columns, values normalized)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return repr(v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

fails = 0
for name in sorted(set(list(oracle) + [g.split("/")[-1] for g in glob.glob(f"{out_dir}/*") if not g.endswith(".json")])):
    try:
        sp_cols_rows = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        sp_rows = sp_cols_rows.fetchall()
        sp_cols = [d[0] for d in sp_cols_rows.description]
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fails += 1; continue
    if name not in oracle:
        print(f"ok(rows-only) {name}: {len(sp_rows)} rows" + ("  ** EMPTY **" if not sp_rows else ""))
        if not sp_rows: fails += 1
        continue
    try:
        dk = con.execute(oracle[name])
        dk_rows = dk.fetchall()
        dk_cols = [d[0] for d in dk.description]
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    sc, sr = canon(sp_cols, sp_rows)
    dc, dr = canon(dk_cols, dk_rows)
    if sc != dc:
        print(f"FAIL {name}: columns {sc} vs {dc}"); fails += 1; continue
    # Type parity: the driver's hash is type-sensitive (r7 lesson — DuckDB
    # sum(CASE..) is HUGEINT while Spark writes BIGINT, identical values
    # still hash-mismatch). Compare declared column types by name.
    sp_types = dict(zip(sp_cols, [d[1] for d in sp_cols_rows.description]))
    dk_types = dict(zip(dk_cols, [d[1] for d in dk.description]))
    tmis = [(c, sp_types[c], dk_types[c]) for c in sp_types
            if str(sp_types[c]) != str(dk_types[c])]
    if tmis:
        print(f"FAIL {name}: type mismatch {tmis}"); fails += 1; continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}"); fails += 1; continue
    if sr != dr:
        bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"FAIL {name}: {sum(1 for a,b in zip(sr,dr) if a!=b)} differing rows, e.g. {bad}")
        fails += 1; continue
    print(f"ok {name}: {len(sr)} rows")
print(f"\n{'ALL GREEN' if fails==0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
