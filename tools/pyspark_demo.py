#!/usr/bin/env python3
"""PySpark client-surface demo — the documented analog of the
reference's Python bindings (PyBallista: python/src/context.rs:48-330
exposes register_parquet + sql over the native context; the Spark-stack
equivalent is PySpark over the SAME JVM session graft extends).

What it proves, from Python only:
  1. graft's session facade is reachable through the py4j gateway
     (GraftSession.wrap over the live JVM session);
  2. graft's SQL surface works end-to-end from Python: CTAS writes a
     REAL Iceberg v2 table via the native writer, DML (DELETE) commits
     a position-delete snapshot, and reads see merge-on-read results;
  3. the catalog is shared — the table graft registers is readable from
     ordinary PySpark `spark.sql` as well.

Run:  python3 tools/pyspark_demo.py          (prints PYSPARK_DEMO_OK)
Wired into sbt test by PySparkDemoSpec (assume()-cancels when pyspark
is not installed).
"""
import os
import shutil
import sys

try:
    from pyspark.sql import SparkSession
except ImportError as e:  # the spec guards on this marker
    print(f"PYSPARK_UNAVAILABLE: {e}")
    sys.exit(3)

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
classes = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "target", "scala-2.13", "classes"))
tbl = "/tmp/graft_pydemo_iceberg"
shutil.rmtree(tbl, ignore_errors=True)

spark = (SparkSession.builder
         .master("local[4]")
         .appName("graft-pyspark-demo")
         .config("spark.driver.extraClassPath", classes)
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

spark.read.parquet(f"{sf}/nation.parquet").createOrReplaceTempView("nation")

# the graft facade over the SAME JVM session, via the py4j gateway —
# the PySpark spelling of PyBallista's BallistaContext()
g = spark._jvm.graft.GraftSession.wrap(spark._jsparkSession)

# CTAS: a real Iceberg table written by graft's native writer, driven
# entirely from Python strings
g.sql("CREATE EXTERNAL TABLE pydemo STORED AS ICEBERG "
      f"LOCATION '{tbl}' AS SELECT n_nationkey, n_name FROM nation")
n0 = g.sql("SELECT count(*) AS n FROM pydemo") \
    .collectAsList().get(0).getLong(0)
assert n0 == 25, f"expected 25 rows after CTAS, got {n0}"

# DML from Python: one position-delete snapshot
g.sql("DELETE FROM pydemo WHERE n_nationkey = 3")
n1 = g.sql("SELECT count(*) AS n FROM pydemo") \
    .collectAsList().get(0).getLong(0)
assert n1 == 24, f"expected 24 rows after DELETE, got {n1}"

# shared catalog: ordinary PySpark SQL reads the graft-registered view
n2 = spark.sql("SELECT count(*) FROM pydemo").collect()[0][0]
assert n2 == 24, f"pyspark-side read expected 24, got {n2}"
names = [r[0] for r in spark.sql(
    "SELECT n_name FROM pydemo ORDER BY n_name LIMIT 2").collect()]
assert len(names) == 2 and all(isinstance(x, str) for x in names), names

print("PYSPARK_DEMO_OK")
spark.stop()
