import sys, time, os, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import importlib.util
spec = importlib.util.spec_from_file_location("scale_curve", "/root/repo/tools/scale_curve.py")
sc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sc)
from convert_parquet_to_csv_spark.session import get_spark, pin_runtime_conf, scoped_shuffle_partitions
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet
from convert_parquet_to_csv_spark.operators.dedup import maximal_duplicated_extents
spark = get_spark(app_name="extents-2m-ab", master="local[32]", extra_conf={"spark.driver.memory": "16g"})
pin_runtime_conf(spark)
path = sc._build_corpus(spark, 2_000_000)
docs = read_parquet(spark, path)
print("corpus rows:", docs.count(), file=sys.stderr)
def run_conf32():
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    maximal_duplicated_extents(docs).write.format("noop").mode("overwrite").save()
    return time.perf_counter()-t0
def run_scoped128():
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    with scoped_shuffle_partitions(spark, 128):
        maximal_duplicated_extents(docs).write.format("noop").mode("overwrite").save()
    return time.perf_counter()-t0
res = {"conf32": [], "scoped128": []}
for it in range(2):
    res["conf32"].append(round(run_conf32(),2))
    res["scoped128"].append(round(run_scoped128(),2))
print(json.dumps({"min": {k: min(v) for k,v in res.items()}, "samples": res}))
