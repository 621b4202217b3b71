"""Skew-handling tests: salted aggregate/join equivalence + balance on the
hot-city synthetic distribution (~30% of pages hit city 0)."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.operators.skew import salted_aggregate, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # page -> mentioned city: ~30% city 0 (sources/synth._mention skew)
    from nominatim_spark.sources import synth

    rows = [
        (p, synth._mention(p, 8, 12, 10, 5)[2]) for p in range(5000)
    ]
    return spark.createDataFrame(rows, "page_id long, city int")


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r.city,): (r.cnt, sorted(r.ids)[:3])
        for r in skewed.groupBy("city")
        .agg(F.count(F.lit(1)).alias("cnt"), F.collect_list("page_id").alias("ids"))
        .collect()
    }
    salted = {
        (r.city,): (r.cnt, sorted(r.ids)[:3])
        for r in salted_aggregate(
            skewed, ["city"],
            {
                "cnt": (F.count(F.lit(1)), F.sum("cnt")),
                "ids": (F.collect_list("page_id"), F.flatten(F.collect_list("ids"))),
            },
            unique_col="page_id", n_salt=8,
        ).collect()
    }
    assert plain == salted


def test_salt_splits_hot_key(spark, skewed):
    hot = with_salt(skewed.filter("city = 0"), "page_id", 8)
    sizes = [r.n for r in hot.groupBy("_salt").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8  # hot key spread over all salt buckets
    assert max(sizes) < sum(sizes) * 0.3  # no bucket dominates


def test_salted_join_matches_plain(spark, skewed):
    dims = spark.createDataFrame(
        [(c, f"city{c}") for c in range(8)], "city int, name string"
    )
    plain = sorted(
        (r.page_id, r.name) for r in skewed.join(dims, "city").collect()
    )
    salted = sorted(
        (r.page_id, r.name)
        for r in salted_join(
            skewed, dims, "city", unique_col="page_id", n_salt=8
        ).collect()
    )
    assert plain == salted and len(plain) == 5000


def test_salt_deterministic(spark, skewed):
    a = with_salt(skewed, "page_id", 8).collect()
    b = with_salt(skewed.repartition(13), "page_id", 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
