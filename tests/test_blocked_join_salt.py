"""blocked_similarity_join salting (ADVICE r6): identical output for
any n_salt, and the right side is the replicated one."""

from clearcare_data_pipeline_spark.operators.joins import blocked_similarity_join


def _frame(spark):
    # one hot block ("B") with 6 members + a small block ("A")
    rows = [
        (1, "alpha widget", "A"),
        (2, "alpha widgot", "A"),
        (10, "beta gear xx", "B"),
        (11, "beta gear xy", "B"),
        (12, "beta gear yy", "B"),
        (13, "beta gearzzz", "B"),
        (14, "beta gear x", "B"),
        (15, "gamma rodrod", "B"),
    ]
    return spark.createDataFrame(rows, "id long, txt string, blk string")


def test_salted_output_identical(spark):
    df = _frame(spark)
    base = blocked_similarity_join(df, df, ["blk"], "txt", min_sim=0.3, n_salt=1)
    salted = blocked_similarity_join(df, df, ["blk"], "txt", min_sim=0.3, n_salt=4)
    key = lambda r: (r["left_id"], r["right_id"], r["similarity"])
    a = sorted(map(key, base.collect()))
    b = sorted(map(key, salted.collect()))
    assert a == b and len(a) > 0


def test_salt_larger_than_block(spark):
    df = _frame(spark)
    base = blocked_similarity_join(df, df, ["blk"], "txt", min_sim=0.0, n_salt=1)
    salted = blocked_similarity_join(df, df, ["blk"], "txt", min_sim=0.0, n_salt=17)
    assert base.count() == salted.count()
