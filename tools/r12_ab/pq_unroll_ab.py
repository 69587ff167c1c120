import sys, time, os, json
sys.path.insert(0, "/root/repo")
from convert_parquet_to_csv_spark import get_spark
from convert_parquet_to_csv_spark.session import pin_runtime_conf
from convert_parquet_to_csv_spark.sources import read_parquet
from pyspark.sql import functions as F
label = sys.argv[1]
spark = get_spark(app_name=f"pq-ab-{label}", master="local[32]")
pin_runtime_conf(spark)
from convert_parquet_to_csv_spark.operators import similarity as S
SF = "/root/testdata/sf0.1"
vecs = read_parquet(spark, os.path.join(SF, "embeddings.parquet"))
pq_queries = vecs.filter(F.col("vec_id") < 5)
# the bench's split-key shapes
train_samples, probe_samples = [], []
for it in range(3):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    books = S.pq_train(vecs, 64, m=32, codes=64, kmeans_iters=1)
    books_c = books.localCheckpoint()
    enc_c = S.pq_encode(vecs, books_c, 64, m=32).localCheckpoint()
    dt = time.perf_counter()-t0
    if it: train_samples.append(dt)
    t0 = time.perf_counter()
    S.pq_probe(enc_c, books_c, pq_queries, 64, k=3, m=32).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter()-t0
    if it: probe_samples.append(dt)
print(json.dumps({"label": label, "train_min": round(min(train_samples),3), "probe_min": round(min(probe_samples),3), "train": [round(x,3) for x in train_samples], "probe": [round(x,3) for x in probe_samples]}))
