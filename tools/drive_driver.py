"""Simulate the driver's verify at sf0.01 through __spark_entry__ only."""
import sys, time, hashlib
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print("ENTRY", len(rows), df.schema.simpleString())

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import datetime, math
def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == int(v) and abs(v) < 1e15: return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    return str(v)

def hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows: h.update(r.encode()); h.update(b"\n")
    return h.hexdigest()[:16]

qs, os_ = e.queries(), e.oracle_sql()
fails = 0
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    dt = time.time() - t0
    if name in os_:
        rel = con.sql(os_[name]); ocols, orows = list(rel.columns), rel.fetchall()
        ok = (sorted(scols)==sorted(ocols) and len(srows)==len(orows)
              and hash_rows(scols,srows)==hash_rows(ocols,orows))
        print(f"{'OK  ' if ok else 'FAIL'} {name} rows={len(srows)} ({dt:.1f}s)")
        fails += 0 if ok else 1
    else:
        print(f"ROWS {name} rows={len(srows)} ({dt:.1f}s)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
