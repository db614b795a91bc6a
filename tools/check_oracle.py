"""Mimic the driver's correctness gate: run each __spark_entry__
query through Spark AND its oracle SQL through DuckDB at a given SF,
compare row counts + order-insensitive values."""
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as entrymod
from featuretools_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, bool):
        return bool(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 4)
    except Exception:
        pass
    return v

qs = entrymod.queries()
oras = entrymod.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    try:
        sdf = fn(spark, SF_DIR)
        scols = sorted(sdf.columns)
        def skey(row):
            return tuple((v is None, str(v)) for v in row)

        srows = sorted(
            (tuple(norm(r[c]) for c in scols) for r in sdf.collect()),
            key=skey,
        )
        if name not in oras:
            print(f"{name}: rows={len(srows)} (no oracle - rows-only)")
            continue
        od = con.execute(oras[name])
        names = [d[0] for d in od.description]
        ocols = sorted(names)
        orows = sorted(
            (tuple(norm(dict(zip(names, row))[c]) for c in ocols)
             for row in od.fetchall()),
            key=skey,
        )
        ok_schema = scols == ocols
        ok_count = len(srows) == len(orows)
        mism = 0
        for a, b in zip(srows, orows):
            if a != b:
                mism += 1
                if mism <= 3:
                    print(f"  MISMATCH {name}: spark={a} oracle={b}")
        status = "OK" if (ok_schema and ok_count and mism == 0) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
              f"schema={'ok' if ok_schema else f'{scols} vs {ocols}'} mismatches={mism}")
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")

print("\nFAILED:" if fails else "\nALL OK", fails if fails else "")
sys.exit(1 if fails else 0)
