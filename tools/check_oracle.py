"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables; compare row count, column names, and order-insensitive values.

Canonicalization is FULL-PRECISION so this gate is at least as strict
as the driver's value hash (round-2 lesson: a 10-significant-digit
canon masked a decimal-vs-double representation difference — q1_pricing
passed locally, stayed red in CORRECTNESS_r02):

- float   -> repr() (shortest round-trip string, all 17 digits)
- Decimal -> str()  (exact declared scale: Decimal('1.50') != 1.5)
- numpy scalars unwrapped via .item() first

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Each OK line prints an order-insensitive md5 of the canonical rows for
both sides; a hash printed by two runs can be diffed without rerunning.
"""

from __future__ import annotations

import decimal
import glob
import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "<null>"
    # array-likes FIRST: a 1-element ndarray has .item() too, and
    # unwrapping it would canonicalize as a bare scalar while the same
    # value as a Python list (Spark side) canonicalizes as '[x]'
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    item = getattr(v, "item", None)
    if item is not None:
        try:
            v = v.item()  # 0-d numpy scalar -> python scalar
        except Exception:
            pass
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.map(canon)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def value_hash(normed: pd.DataFrame) -> str:
    """Order-insensitive digest of the canonical (already sorted) rows."""
    h = hashlib.md5()
    for row in normed.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as ent

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            n_ok += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        a, b = norm(sdf), norm(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark : {a.loc[i].to_dict()}")
                print(f"  oracle: {b.loc[i].to_dict()}")
            n_bad += 1
            continue
        ha, hb = value_hash(a), value_hash(b)
        tag = "OK  " if ha == hb else "FAIL"
        if ha != hb:  # unreachable if equals() passed; belt and braces
            n_bad += 1
        else:
            n_ok += 1
        print(
            f"{tag} {name}: {len(a)} rows match  hash={ha}  [{time.time()-t0:.1f}s]"
        )
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
