"""Drive __spark_entry__.py exactly as the driver would: plain default
SparkSession (no engine tuning, no UTC tz pre-set), entry() smoke, then a
sample of queries at sf0.01 hash-compared against DuckDB oracles."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

# deliberately NOT the engine's get_spark(): simulate the driver's own session
# with a non-UTC timezone as the adversarial probe. JPC_TZ overrides (e.g.
# Asia/Kolkata — a half-hour offset catches whole-hour-safe assumptions).
spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('JPC_CPUS', '8')}]"
    )
    .appName("driver-sim")
    .config(
        "spark.sql.session.timeZone",
        os.environ.get("JPC_TZ", "America/New_York"),
    )
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

t0 = time.time()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}, {time.time()-t0:.1f}s")
assert len(rows) > 0

qs = e.queries()
oracles = e.oracle_sql()
print(f"queries: {len(qs)}, oracled: {len(oracles)}")
assert set(oracles) <= set(qs)

import duckdb

con = duckdb.connect()
# JPC_SF_DIR: point the whole differential check at any fixture dir (e.g.
# scripts/gen_fixtures.py output) — proves spark/duckdb agreement isn't an
# artifact of the one driver-generated dataset
SF = os.environ.get("JPC_SF_DIR", "/root/testdata/sf0.01")
# drift-aware registration: identical to the driver's plain SELECT * on its
# homogeneous fixtures; on an --evolve layout it mirrors load_table's
# catalog-contract read (see tests/oracle_utils.register_duck_views)
from tests.oracle_utils import register_duck_views

register_duck_views(con, SF)

from tests.oracle_utils import compare_query

sample = sys.argv[1:] or sorted(qs)
fails = []
for name in sample:
    if name not in oracles:
        # rows-only query: driver records a weaker ran+rows check
        try:
            n = qs[name](spark, SF).count()
            print(f"OK  {name}: rows-only, {n} rows")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: rows-only raised {exc!r:.200}")
            fails.append(name)
        continue
    try:
        ok, detail = compare_query(spark, con, qs[name], oracles[name], SF)
    except Exception as exc:  # noqa: BLE001 — one bad query must not
        ok, detail = False, f"raised {exc!r}"  # abort the whole sweep
    status = "OK " if ok else "FAIL"
    print(f"{status} {name}: {detail[:200]}")
    if not ok:
        fails.append(name)
print(f"\n{len(sample)-len(fails)}/{len(sample)} matched at {SF}")
sys.exit(1 if fails else 0)
