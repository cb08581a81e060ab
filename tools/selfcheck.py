#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, sorts columns by name, and compares row-by-row.
Dev tool only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.execute(f"SELECT * FROM '{pq}/*.parquet'").df())
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            # The driver hashes SERIALIZED values, so any dtype-KIND mismatch
            # (int-vs-float from a DuckDB HUGEINT window sum, bool-vs-int,
            # datetime-vs-int, ...) is a real divergence even when the values
            # compare equal after pandas coercion (1.0 == 1, True == 1). Fail
            # loud instead of coercing — the int/float case alone hid
            # q_sessionize for 2 rounds. Width-only differences within the
            # same signedness family are the one safe pair.
            ka, kb = a.dtype.kind, b.dtype.kind
            if ka != kb and {ka, kb} != {'i', 'u'}:
                bad = (c, 'dtype', str(a.dtype), str(b.dtype), 0)
                break
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    ae = a.astype('float64'); be = b.astype('float64')
                    neq = ~((ae == be) | (ae.isna() & be.isna()))
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, a.iloc[i], b.iloc[i], int(neq.sum()))
                break
        if bad:
            c, i, av, bv, n = bad
            if i == 'dtype':
                print(f"FAIL {name}: col {c} dtype-kind mismatch spark={av} oracle={bv}"
                      " (different kinds serialize differently under the driver hash)")
            else:
                print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without an oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip('/'))
        if name not in oracle:
            n = len(glob.glob(f"{d}/*.parquet"))
            print(f"INFO {name}: no oracle ({'output present' if n else 'NO OUTPUT'})")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
