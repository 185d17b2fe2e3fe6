"""PROVENANCE NOTE (post-run): this A/B ran on the r12 working tree
WHERE THE WIDE-MEANS CODE STILL EXISTED (between commits 82f3643^ and
its revert); it monkeypatches clustering.MEANS_WIDE_MAX_DIM, which was
REMOVED after the measurement decided against the wide path — so this
script is a frozen receipt, not re-runnable on HEAD. To reproduce,
reintroduce the wide/long crossover from the commit history or re-create
it from the numbers pinned at the top of operators/clustering.py."""
"""Alternating A/B: wide vs long Lloyd means in flat kmeans_fit at sf10
(k=4, iters=3 — the emb_kmeans_clusters shape)."""
import json, statistics, sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())

import clearcare_data_pipeline_spark.operators.clustering as C
from clearcare_data_pipeline_spark.queries.similarity import _emb

df = _emb(spark, ".localdata/sf10")
df.count()

def run(max_dim):
    C.MEANS_WIDE_MAX_DIM = max_dim
    t0 = time.time()
    _c, a = C.kmeans_fit(df, k=4, iters=3)
    a.count()
    return round(time.time() - t0, 2)

run(256); run(0)
wide, long_ = [], []
for _ in range(3):
    wide.append(run(256))
    long_.append(run(0))
out = {"wide_runs": wide, "long_runs": long_,
       "wide_median": statistics.median(wide), "long_median": statistics.median(long_)}
print(json.dumps(out))
with open(".r12state/kmeans_ab_sf10.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
