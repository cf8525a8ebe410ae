"""Micro-benchmark: 64-dim unrolled dot over ~250k pairs.

Determines whether the pair-join cost is codegen fallback (interpreted
expression eval), Janino compile time, or partition-count starvation.
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("prof_dot")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from jsonschema_spark.operators.dedup import dot_unrolled

emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
emb.count()

small = emb.limit(500).select(
    F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
).localCheckpoint(eager=True)
small2 = small.select(
    F.col("id_a").alias("id_b"), F.col("va").alias("vb")
)

pairs = small.crossJoin(small2)  # 250k pairs


def run(tag, df):
    t = time.time()
    n = df.count()
    d1 = time.time() - t
    t = time.time()
    n = df.count()
    d2 = time.time() - t
    print(f"{tag:40s} 1st={d1:6.2f}s 2nd={d2:6.2f}s rows={n}", flush=True)


dot = dot_unrolled(F.col("va"), F.col("vb"), 64)
scored = pairs.select((dot).alias("d")).filter(F.col("d") > 1e18)
run("unrolled dot 64, default", scored)

# how many partitions does the crossjoin produce?
print("pairs partitions:", pairs.rdd.getNumPartitions())

# repartitioned to 32
scored32 = pairs.repartition(32).select((dot).alias("d")).filter(
    F.col("d") > 1e18
)
run("unrolled dot 64, repartition(32)", scored32)

# wholestage off
spark.conf.set("spark.sql.codegen.wholeStage", "false")
run("unrolled dot 64, wholeStage=false", scored32)
spark.conf.set("spark.sql.codegen.wholeStage", "true")

# aggregate HOF form for comparison
hof = F.aggregate(
    F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
    F.lit(0.0),
    lambda acc, v: acc + v,
)
run("HOF aggregate dot, repartition(32)",
    pairs.repartition(32).select(hof.alias("d")).filter(F.col("d") > 1e18))

# plan check
scored32.explain("formatted")
spark.stop()
