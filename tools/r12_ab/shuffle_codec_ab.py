import sys, time, os, json, hashlib
sys.path.insert(0, "/root/repo")
codec = sys.argv[1]
from convert_parquet_to_csv_spark import get_spark
from convert_parquet_to_csv_spark.session import pin_runtime_conf
from convert_parquet_to_csv_spark.sources import read_parquet
spark = get_spark(app_name=f"codec-{codec}", master="local[32]",
                  extra_conf={"spark.io.compression.codec": codec, "spark.driver.memory": "16g"})
pin_runtime_conf(spark)
from convert_parquet_to_csv_spark.operators.dedup import minhash_dedup
from convert_parquet_to_csv_spark.operators.curation import remove_duplicated_spans
SF = "/root/testdata/sf0.1"
path = "/tmp/cptc_bench_docs500k_{}.parquet".format(hashlib.md5(SF.encode()).hexdigest()[:8])
docs = read_parquet(spark, path)
keys = [
    ("span500k", lambda: remove_duplicated_spans(docs, n=4, max_docs=2)),
    ("minhash500k", lambda: minhash_dedup(docs, num_perm=32, bands=8, threshold=0.5)),
]
samples = {k: [] for k,_ in keys}
for it in range(4):
    for name, fn in keys:
        spark.catalog.clearCache()
        t0=time.perf_counter(); fn().write.format("noop").mode("overwrite").save(); dt=time.perf_counter()-t0
        if it: samples[name].append(round(dt,3))
print(json.dumps({"codec": codec, "min": {k: min(v) for k,v in samples.items()}, "samples": samples}))
