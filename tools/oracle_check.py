#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: register every
<sfDir>/*.parquet as a DuckDB view, run the oracle SQL, load the Spark
result from <verifyOutDir>/<name>/, and compare rows / schema(names) /
a value hash with columns sorted by name and rows sorted by all columns.
"""
import json, sys, glob, os, hashlib
import duckdb
import numpy as np
import pandas as pd

def norm_cell(v, f32=False):
    # None/NaN get one sentinel (round-2 ADVICE). Floats render by the
    # COLUMN's dtype: a float32 column widens to float64 with ~8 junk
    # decimal digits (0.8571 -> 0.857100009918...), so it renders at
    # float32 precision; float64 columns keep %.9g so genuine sub-1e-7
    # engine divergence still fails the value-exact compare (scoping the
    # collapse to float32 columns keeps the oracle strict everywhere else)
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if pd.isna(v):
            return "NULL"
        if f32:
            return f"{float(np.float32(v)):.7g}"
        return f"{float(v):.9g}"
    return str(v)

def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    f32s = [df[c].dtype == np.float32 for c in df.columns]
    rows = [[norm_cell(v, f) for v, f in zip(r, f32s)]
            for r in df.astype(object).values.tolist()]
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in
                             glob.glob(os.path.join(spark_path, "*.parquet"))],
                            ignore_index=True)
        except Exception as e:
            print(f"{name}: NO SPARK OUTPUT ({e})"); bad += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); bad += 1; continue
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        hmatch = value_hash(sdf) == value_hash(odf) if rows and schema else False
        status = "OK" if (rows and schema and hmatch) else "MISMATCH"
        if status != "OK":
            bad += 1
            print(f"{name}: rows={rows}({len(sdf)}/{len(odf)}) schema={schema} hash={hmatch}")
            if rows and schema and not hmatch:
                s = sdf.reindex(sorted(sdf.columns), axis=1).astype(str)
                o = odf.reindex(sorted(odf.columns), axis=1).astype(str)
                sv = sorted(map(tuple, s.values.tolist()))
                ov = sorted(map(tuple, o.values.tolist()))
                for a, b in zip(sv, ov):
                    if a != b:
                        print(f"  spark : {a}\n  oracle: {b}")
                        break
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
