#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (dev tool only —
the Scala library has no Python dependency). Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
Compares each <name>/ parquet dump against the oracle SQL in
oracle_sql.json, after sorting columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb

# Declared rows+schema-only queries (VERDICT r15 item 7): the oracle
# replays row count, column names and dtypes exactly but carries typed
# SENTINELS for the listed columns, whose values no SQL engine can
# replay. EMPTY since r18: t29 moved to the token-dictionary coder
# (integer arithmetic, bin() in both engines) and is fully exact; the
# zlib DEFLATE expression remains spec+QUALITY-gated outside the
# catalog hash gate.
SENTINEL_COLS = {}

def canon(con, rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, only=None, json_out=None, timing=False):
    """only: optional set of query names; json_out: optional path for a
    CORRECTNESS-shaped per-query JSON artifact (the sf1 sidecar's
    standing output); timing: print per-oracle DuckDB wall seconds."""
    import time
    results = {}
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.isdir(p):  # spark-written dir (e.g. the sf1 tables)
            p = f"{p}/*.parquet"
        if os.path.isdir(f"{sf_dir}/{tbl}.parquet") or os.path.exists(f"{sf_dir}/{tbl}.parquet"):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
        missing = set(only) - set(oracle)
        if missing:
            print(f"WARN: no oracle for {sorted(missing)}")
    n_pass = n_fail = 0
    def rec(name, ok, got=None, want=None, err=None):
        results[name] = {
            "rows_match": ok or (got is not None and want is not None
                                 and len(got) == len(want)),
            "schema_match": ok or (got is not None and want is not None
                                   and list(got.columns) == list(want.columns)),
            "hash_match": ok,
            "spark_rows": None if got is None else len(got),
            "oracle_rows": None if want is None else len(want),
            "err": err}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            rec(name, False, err="no spark output"); continue
        try:
            got = canon(con, con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            want = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            rec(name, False, err=str(e)[:500]); continue
        finally:
            if timing:
                print(f"  [oracle] {name}: {time.time()-t0:.1f}s")
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; rec(name, False, got, want, "schema"); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1
            rec(name, False, got, want, "rows"); continue
        sentinels = SENTINEL_COLS.get(name, set())
        if sentinels:
            bad = [c for c in got.columns if got[c].dtype != want[c].dtype]
            # canon() sorted rows by ALL columns; sentinel values differ
            # by declaration, so re-align both sides on the exact
            # columns alone before comparing them
            exact = [c for c in got.columns if c not in sentinels]
            g2 = got[exact].sort_values(by=exact, kind="mergesort").reset_index(drop=True)
            w2 = want[exact].sort_values(by=exact, kind="mergesort").reset_index(drop=True)
            import numpy as np
            for c in exact:
                if bad:
                    continue
                g, w = g2[c], w2[c]
                # same bit-exact float rule as the main path (ADVICE
                # r16: Series.eq treats 0.0 == -0.0; the driver's hash
                # is over bytes)
                if g.dtype.kind == 'f' and w.dtype.kind == 'f':
                    neq = g.to_numpy(dtype='f8').view('i8') != \
                          w.to_numpy(dtype='f8').view('i8')
                    if neq.any():
                        bad.append(f"exact col {c} differs at row {int(np.argmax(neq))}")
                    continue
                neq = ~(g.eq(w) | (g.isna() & w.isna()))
                if neq.any():
                    bad.append(f"exact col {c} differs at row {int(neq.idxmax())}")
            if bad:
                print(f"FAIL {name}: declared-sentinel compare: {bad[:3]}")
                n_fail += 1; rec(name, False, got, want, str(bad[:3]))
            else:
                print(f"PASS {name} ({len(got)} rows; sentinel cols "
                      f"{sorted(sentinels)} excluded, rest exact)")
                n_pass += 1; rec(name, True, got, want)
            continue
        import pandas as pd
        import numpy as np
        # bit-exact on floats (the driver hashes bytes: 0.0 != -0.0
        # there even though pandas .equals treats them equal)
        diffs = []
        for c in got.columns:
            g, w = got[c], want[c]
            # dtype drift (e.g. Spark bigint vs oracle double) must fail
            # even when the values compare numerically equal — the
            # driver's hash is over typed bytes
            if g.dtype != w.dtype:
                diffs.append(f"{c}: dtype {g.dtype} != {w.dtype}")
                continue
            if g.dtype.kind == 'f' and w.dtype.kind == 'f':
                gb = g.to_numpy(dtype='f8').view('i8')
                wb = w.to_numpy(dtype='f8').view('i8')
                neq = gb != wb
            else:
                neq = ~(g.eq(w) | (g.isna() & w.isna())).to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                diffs.append(f"{c}[{i}]: {g[i]!r} != {w[i]!r}")
        if diffs:
            print(f"FAIL {name}: {'; '.join(diffs[:3])}"); n_fail += 1
            rec(name, False, got, want, '; '.join(diffs[:3])); continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        rec(name, True, got, want)
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = None
    json_out = None
    timing = False
    rest = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--json":
            json_out = args[i + 1]; i += 2
        elif args[i] == "--timing":
            timing = True; i += 1
        else:
            rest.append(args[i]); i += 1
    sys.exit(main(rest[0], rest[1], only, json_out, timing))
