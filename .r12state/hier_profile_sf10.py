"""Per-level phase attribution of hierarchical_assign at sf10 (r12)."""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())

from clearcare_data_pipeline_spark.operators.clustering import (
    SEMDEDUP_TARGET_WIDTH, hierarchical_assign)
from clearcare_data_pipeline_spark.queries.similarity import _emb, _NEAR_DUP_MOD, _SEMDEDUP_ITERS

SF = ".localdata/sf10"
vecs = _emb(spark, SF).select("vec_id", "embedding")
copies = vecs.where(F.col("vec_id") % _NEAR_DUP_MOD == 0).withColumn(
    "vec_id", F.col("vec_id") + 1000000)
df = vecs.unionByName(copies)
df.count()  # warmup

stats = {}
t0 = time.time()
assigned = hierarchical_assign(df, target_width=SEMDEDUP_TARGET_WIDTH,
                               iters=_SEMDEDUP_ITERS, stats=stats)
n = assigned.count()
stats["total_sec"] = round(time.time() - t0, 2)
stats["n_assigned"] = n
print(json.dumps(stats))
with open(".r12state/hier_profile_sf10.json", "w") as f:
    json.dump(stats, f, indent=1)
spark.stop()
