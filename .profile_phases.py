import sys, time, os
sys.path.insert(0, "/root/repo")
master = sys.argv[1]
from pyorchdb_spark.session import build_session
from pyspark.sql import functions as F

spark = build_session(master=master, extra_conf={"spark.driver.memory": "24g"})
ev = spark.read.parquet("/root/repo/.bench_data/events_1000000")

def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"{master} {label}: {round(time.time()-t0,2)}s", flush=True)

t("scan_only", ev)

from pyorchdb_spark.ingest import prepare_events
t("scan_plus_udfs", prepare_events(ev))

from pyorchdb_spark.operators.dedup import lww_dedup, lww_dedup_salted
t("dedup_maxby", lww_dedup(ev))
t("dedup_window", lww_dedup(ev, strategy="window"))
t("dedup_salted", lww_dedup_salted(ev))

from pyorchdb_spark.sources.lake import composite_key
t0 = time.time()
lww_dedup(ev).repartitionByRange(32, composite_key()).sortWithinPartitions(composite_key()).write.mode("overwrite").parquet("/root/repo/.bench_work/prof_out")
print(f"{master} dedup_plus_rangewrite: {round(time.time()-t0,2)}s", flush=True)
spark.stop()
