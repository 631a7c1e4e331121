#!/usr/bin/env python3
"""Reference-architecture baseline: base HITS exactly in the reference's
style (pair-RDD joins, pickled lambdas, 2 driver collects/iteration —
mirroring JustAToaster/BigData_HITS src/base_hits.py) on the SAME
derived order graph the graft engine benchmarks. Produces the
single-node throughput number BENCH is compared against.
Usage: reference_style_bench.py [sfDir] [numIter]
"""
import math, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
num_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 8

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("WARN")

orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
e1 = orders.select(F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                   F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("dst"))
e2 = li.select(F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
               F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"))
w = Window.partitionBy("l_orderkey").orderBy("l_partkey", "l_quantity")
e3 = (li.select(F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
                F.concat(F.lit("p"), F.lead("l_partkey", 1).over(w).cast("string")).alias("dst"))
        .where(F.col("dst").isNotNull()))
edgesDF = e1.unionAll(e2).unionAll(e3)
nodesDF = edgesDF.select(F.col("src").alias("id")).union(
    edgesDF.select(F.col("dst").alias("id"))).distinct()

t0 = time.time()
# ---- from here on, the reference's exact RDD pipeline shape ----
nodes = nodesDF.rdd
edges = edgesDF.rdd.map(lambda e: (e[0], e[1]))
edgesT = edges.map(lambda e: (e[1], e[0]))

num_nodes = nodes.count()
auths = nodes.map(lambda n: (n[0], 1.0 / math.sqrt(num_nodes)))
hubs = auths

def normalize_rdd(rdd):
    s = rdd.map(lambda x: (0, x[1] * x[1])).reduceByKey(lambda a, b: a + b).collect()[0][1]
    n = math.sqrt(s)
    return rdd.map(lambda x: (x[0], x[1] / n))

for i in range(num_iter):
    hubs = edgesT.join(auths).map(lambda x: (x[1][0], x[1][1])).reduceByKey(lambda a, b: a + b)
    auths = edges.join(hubs).map(lambda x: (x[1][0], x[1][1])).reduceByKey(lambda a, b: a + b)
    hubs = normalize_rdd(hubs)
    auths = normalize_rdd(auths)

n_h = hubs.count()
n_a = auths.count()
dt = time.time() - t0
print(f'{{"metric":"reference_style_base_hits","value":{dt:.3f},"unit":"sec",'
      f'"hubs":{n_h},"auths":{n_a},"iters":{num_iter},"sf":"{sf_dir}"}}')
spark.stop()
