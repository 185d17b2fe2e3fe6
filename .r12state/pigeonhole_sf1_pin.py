"""Direct sf1 pin of the pigeonhole block-join == all-pairs equivalence
on the DISTINCT-signature relation (VERDICT r11 ask #1c). Brute force
all-pairs hamming<=3 over the ~36.7k distinct simhash signatures vs the
4-block pigeonhole candidate join over the same relation."""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())

from clearcare_data_pipeline_spark.operators.dedup import (
    simhash_near_dup_pairs, simhash_signatures)
from clearcare_data_pipeline_spark.queries.textops import corpus_near_dups

SF = ".localdata/sf1"
t0 = time.time()
sigs = simhash_signatures(corpus_near_dups(spark, SF))
distinct = sigs.select("simhash").distinct().cache()
n_distinct = distinct.count()

rel = distinct.select(F.col("simhash").alias("doc_id"), "simhash")
block = simhash_near_dup_pairs(rel, max_hamming=3, bits=64, num_blocks=4)
block_agg = block.groupBy("hamming").count().collect()
t1 = time.time()

a = distinct.select(F.col("simhash").alias("a")).repartition(64)
b = distinct.select(F.col("simhash").alias("b"))
brute = (a.crossJoin(b).where(F.col("a") < F.col("b"))
         .withColumn("hamming", F.bit_count(F.col("a").bitwiseXOR(F.col("b"))))
         .where(F.col("hamming") <= 3))
brute_agg = brute.groupBy("hamming").count().collect()
t2 = time.time()

bk = {r["hamming"]: r["count"] for r in block_agg}
br = {r["hamming"]: r["count"] for r in brute_agg}
# count-match is necessary; pin set equality too via anti-joins
only_block = block.join(brute.select("a", "b"), ["a", "b"], "left_anti").count()
only_brute = brute.join(block.select("a", "b"), ["a", "b"], "left_anti").count()
out = {
    "sf_dir": SF, "n_distinct_sigs": n_distinct,
    "block_join_by_hamming": bk, "brute_force_by_hamming": br,
    "pairs_only_in_block": only_block, "pairs_only_in_brute": only_brute,
    "equal": bk == br and only_block == 0 and only_brute == 0,
    "block_sec": round(t1 - t0, 1), "brute_sec": round(t2 - t1, 1),
}
print(json.dumps(out))
with open(".r12state/pigeonhole_sf1_pin.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
