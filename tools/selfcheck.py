#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), read the spark result parquet, sort
columns by name, sort rows, compare cell-by-cell with a float tolerance
mirror of the driver's hash compare (tight: values must round-trip equal
at 1e-9 relative).
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def load_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(
        (tuple(canon(col[i]) for col in data) for i in range(tbl.num_rows)),
        key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            otbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        stbl = pq.read_table(spark_path)
        ocols, orows = load_rows(otbl)
        scols, srows = load_rows(stbl)
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
            continue
        bad = [(i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o]
        if bad:
            i, s, o = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols : {scols}")
            print(f"  spark: {s}")
            print(f"  duck : {o}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(srows)} rows)")
            n_ok += 1
    # rows-only checks for oracle-less queries
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = pq.read_table(d).num_rows
            print(f"rows {d.name}: {n} {'ok' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
