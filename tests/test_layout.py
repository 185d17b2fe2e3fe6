"""Layout operators: disjoint file ranges + compaction file counts."""

import glob

import pyarrow.parquet as pq

from clearcare_data_pipeline_spark.operators.layout import (
    compact_parquet,
    write_range_layout,
)
from clearcare_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _file_ranges(path, column):
    """(min, max) of `column` per parquet file, from footer stats."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges


def test_range_layout_files_are_disjoint(spark, tmp_path):
    out = str(tmp_path / "clustered")
    li = load_table(spark, SF, "lineitem")
    write_range_layout(li, out, ["l_shipdate"], num_files=6)
    ranges = sorted(_file_ranges(out, "l_shipdate"))
    assert len(ranges) >= 4  # range partitioner may merge sparse tails
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        # boundary rows may share a timestamp; strict overlap is a bug
        assert hi1 <= lo2
    # whole dataset survives the rewrite
    assert spark.read.parquet(out).count() == li.count()


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src, dst = str(tmp_path / "tiny"), str(tmp_path / "compacted")
    li = load_table(spark, SF, "lineitem")
    li.repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 40
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n
    assert len(files) < 5
    assert spark.read.parquet(dst).count() == li.count()


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    # Hive-style partition columns are the third pruning axis (beyond
    # file ranges and row-group stats): a partition filter must appear
    # in the scan so non-matching directories are never listed.
    out = str(tmp_path / "by_flag")
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem")
    li.write.partitionBy("l_returnflag").parquet(out)
    df = spark.read.parquet(out).where(F.col("l_returnflag") == "R")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "l_returnflag" in pf[0]
    assert df.count() == li.where(F.col("l_returnflag") == "R").count()


def test_orc_range_layout_roundtrip(spark, sf_dir, tmp_path):
    from clearcare_data_pipeline_spark.operators.layout import (
        compact_parquet,
        write_range_layout,
    )
    from clearcare_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "orders_orc")
    write_range_layout(orders, dst, ["o_orderdate"], 4, file_format="orc")
    back = spark.read.orc(dst)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    # compaction in orc too
    out = str(tmp_path / "orders_orc_compact")
    n = compact_parquet(spark, dst, out, target_file_mb=512, file_format="orc")
    assert n == 1
    assert spark.read.orc(out).count() == orders.count()


def test_text_corpus_reader_stable_ids(spark, tmp_path):
    from clearcare_data_pipeline_spark.sources.tables import read_text_corpus

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("hello world\n\nsecond doc\n")
    (p / "b.txt").write_text("third doc\n")
    docs = read_text_corpus(spark, str(p))
    rows = docs.collect()
    assert {r.text for r in rows} == {"hello world", "second doc", "third doc"}
    # ids deterministic across a second read
    again = {r.text: r.doc_id for r in read_text_corpus(spark, str(p)).collect()}
    assert all(again[r.text] == r.doc_id for r in rows)


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.layout import zorder_key_expr

    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    key = df.select(zorder_key_expr(F.col("a"), F.col("b"), bits=3).alias("z")).collect()[0].z
    # a bits 1,0,1 -> positions 0,2,4 ; b bits 1,1,0 -> positions 1,3,5
    # z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    assert key == (1 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4) | (0 << 5)


def test_zorder_layout_clusters_both_dims(spark, sf_dir, tmp_path):
    from clearcare_data_pipeline_spark.operators.layout import write_zorder_layout
    from clearcare_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    dst = str(tmp_path / "li_z")
    write_zorder_layout(
        li, dst, "l_partkey", "l_suppkey",
        ranges={"l_partkey": (0, 2000), "l_suppkey": (0, 100)},
        num_files=4, bits=8,
    )
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    # each output file covers a bounded slice of BOTH key spaces:
    # per-file spans should be far smaller than the global span
    import pyarrow.parquet as pq
    import os as _os

    files = [f for f in _os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) >= 2
    spans_a = []
    for f in files:
        md = pq.read_metadata(_os.path.join(dst, f))
        lo = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_a.append(hi - lo)
    # at least one file covers a strict subrange (clustering happened)
    assert min(spans_a) < 2000 * 0.9


def test_date_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.layout import write_date_partitioned
    from clearcare_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    dst = str(tmp_path / "events_by_date")
    write_date_partitioned(ev, dst, "ts")
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    one_day = back.where(F.col("_date") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the partition filter must reach the scan's PartitionFilters,
    # not survive as a post-scan Filter on data
    assert "PartitionFilters: [" in plan
    assert "isnotnull(_date" in plan or "(_date" in plan.split("PartitionFilters")[1][:200]
    # pruned scan reads fewer partitions than the full dataset has
    import os as _os

    n_dirs = len([d for d in _os.listdir(dst) if d.startswith("_date=")])
    assert n_dirs > 1
