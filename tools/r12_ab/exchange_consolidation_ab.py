import sys, time, os, json
sys.path.insert(0, "/root/repo")
from convert_parquet_to_csv_spark import get_spark
from convert_parquet_to_csv_spark.plans import registry
from convert_parquet_to_csv_spark.session import pin_runtime_conf
from convert_parquet_to_csv_spark.sources import read_parquet
from pyspark.sql import functions as F
label = sys.argv[1]
spark = get_spark(app_name=f"exch-ab-{label}", master="local[32]")
pin_runtime_conf(spark)
registry.load_all()
SF = "/root/testdata/sf0.1"
from convert_parquet_to_csv_spark.operators import curation as C
docs = read_parquet(spark, os.path.join(SF, "documents.parquet"))
def dsir_x():
    C.dsir_importance_weights(docs.filter(F.col("source") != "src0"), docs.filter(F.col("source") == "src0"), num_buckets=4096, hash_fn="xxhash64").write.format("noop").mode("overwrite").save()
def q(name):
    def f():
        registry.QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
    return f
keys = [("dsir_x", dsir_x), ("gopher_sig", q("gopher_repetition_signals")), ("qtrain", q("quality_classifier_train"))]
samples = {k: [] for k,_ in keys}
for it in range(3):
    for name, fn in keys:
        spark.catalog.clearCache()
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0
        if it: samples[name].append(dt)
print(json.dumps({"label": label, "min": {k: round(min(v),3) for k,v in samples.items()}, "samples": {k:[round(x,3) for x in v] for k,v in samples.items()}}))
