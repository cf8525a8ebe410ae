"""Stage-by-stage wall-time attribution for semantic_dedup at sf0.1.

Breaks the pipeline at its natural seams (k-means assign+checkpoint,
pair join, connected components, final left join) and times each
action separately, so the 17.6s headline cost can be attributed.
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cores = sys.argv[2] if len(sys.argv) > 2 else "32"

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.driver.memory", "16g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("prof_semdedup")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from jsonschema_spark.core import session as _sess

_sess.tune(spark)

from jsonschema_spark.operators import similarity
from jsonschema_spark.operators.dedup import (
    dot_unrolled,
    duplicate_clusters,
)

emb = spark.read.parquet(f"{sf}/embeddings.parquet")
emb.count()  # warm the scan

T0 = time.time()
marks = [("start", T0)]


def mark(name):
    marks.append((name, time.time()))
    a, b = marks[-2], marks[-1]
    print(f"  {name:28s} {b[1]-a[1]:6.2f}s", flush=True)


dims = 64
dot = lambda x, y: dot_unrolled(x, y, dims)  # noqa: E731

assign = similarity.kmeans_embeddings(emb, 8, 2, "embedding", "vec_id", 42)
assign = assign.select("vec_id", "cluster")
withc = (
    emb.select("vec_id", "embedding")
    .join(assign, "vec_id")
    .withColumn(
        "__norm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )
    .localCheckpoint(eager=True)
)
mark("kmeans+checkpoint")

a = withc.select(
    F.col("vec_id").alias("id_a"), "cluster",
    F.col("embedding").alias("va"), F.col("__norm").alias("na"),
)
b = withc.select(
    F.col("vec_id").alias("id_b"), "cluster",
    F.col("embedding").alias("vb"), F.col("__norm").alias("nb"),
)
pairs = (
    a.join(b, "cluster")
    .filter(F.col("id_a") < F.col("id_b"))
    .select(
        "id_a",
        "id_b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .alias("cosine"),
    )
    .filter(F.col("cosine") >= 0.4)
    .select("id_a", "id_b")
)
n_pairs = pairs.count()
mark(f"pair-join count={n_pairs}")

pairs_c = pairs.localCheckpoint(eager=True)
mark("pairs checkpoint")

comp = duplicate_clusters(pairs_c)
n_comp = comp.count()
mark(f"components count={n_comp}")

out = emb.select("vec_id").join(
    comp.select(F.col("id").alias("vec_id"), "cluster_id"),
    "vec_id",
    "left",
)
n_out = out.count()
mark(f"final-join count={n_out}")

print(f"TOTAL {time.time()-T0:.2f}s")
spark.stop()
