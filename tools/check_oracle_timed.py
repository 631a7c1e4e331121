#!/usr/bin/env python3
"""check_oracle with per-query timing + unbuffered output."""
import sys, time, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 12))
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"[MISS] {name}", flush=True); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            exp = con.sql(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {str(e)[:250]} ({time.time()-t0:.1f}s)", flush=True)
            n_fail += 1; continue
        dt = time.time() - t0
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[FAIL] {name}: cols {sorted(got_cols)} != {sorted(exp_cols)} ({dt:.1f}s)", flush=True); n_fail += 1
            continue
        a, b = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} != {len(b)} ({dt:.1f}s)", flush=True); n_fail += 1
        elif a != b:
            d = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"[FAIL] {name}: {len(d)}/{len(a)} rows differ; e.g. {d[:2]} ({dt:.1f}s)", flush=True); n_fail += 1
        else:
            print(f"[ok  ] {name}: {len(a)} rows ({dt:.1f}s)", flush=True); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==", flush=True)

if __name__ == "__main__":
    main()
