"""Hot-tag skew handling: one tag dominates traffic (the prod norm,
reference docs/quickstart.md:122-127 — a single tag ≈ 100% of msgs).
Partitioning sink writes by tag alone would put the hot tag's entire
volume in one task; salting with pmod(xxhash64(doc_id), S) spreads it."""

from pyspark.sql import functions as F

from go_fluentd_spark.plans import pipeline as P


def partition_sizes(df, *cols):
    return [
        r.n
        for r in df.repartition(16, *cols)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_salting_defuses_hot_tag(spark, sf_dir):
    df = P.enriched(spark, sf_dir).select("doc_id", "tag").persist()
    try:
        total = df.count()
        by_tag = partition_sizes(df, F.col("tag"))
        salted = partition_sizes(
            df, F.col("tag"), F.pmod(F.xxhash64("doc_id"), F.lit(8))
        )
        imb_tag = max(by_tag) / (total / 16)
        imb_salt = max(salted) / (total / 16)
        # app.spring is ~66% of routed rows -> tag-only partitioning is
        # badly imbalanced; salting must cut the max-partition ratio sharply
        assert imb_tag > 3.0, (imb_tag, by_tag)
        assert imb_salt < imb_tag / 2, (imb_salt, salted)
    finally:
        df.unpersist()
