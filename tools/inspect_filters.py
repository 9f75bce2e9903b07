"""One-off: print Filter conditions in the 4 audit-warned plans so we
can see whether the heavy kernel is genuinely re-derived below a join
(the r8 dedup defect) or a benign one-off threshold filter."""
import re
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import __spark_entry__ as entry

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs = entry.queries()
for name in sys.argv[1:]:
    df = qs[name](spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    print(f"\n===== {name} =====")
    for fm in re.finditer(
        r"\(\d+\) Filter[^\n]*\nInput[^\n]*\nCondition : ([^\n]+)", plan
    ):
        cond = fm.group(1)
        print(f"-- Filter ({len(cond)} chars): {cond[:600]}")
spark.stop()
