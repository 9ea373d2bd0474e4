"""Sorted-neighborhood blocking tests: hand-computed pins + contracts.

The windowed pair sets below are worked by hand from the SNM definition
(rank by key then pair each record with the w−1 that follow), so a
regression in the rank recipe, the explode bounds, or the verify filter
shifts a pinned pair set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.blocking import (
    SortedNeighborhoodDeduper,
    multipass_sorted_neighborhood,
    sorted_neighborhood_pairs,
    sorted_neighborhood_rank,
)


def _people(spark):
    # sort by (city, age): ranks are
    #   1:(ams,20,id=5) 2:(ams,30,id=2) 3:(bru,25,id=4)
    #   4:(bru,25,id=7) 5:(bru,40,id=1) 6:(cdg,10,id=3)
    return spark.createDataFrame(
        [
            (1, "bru", 40),
            (2, "ams", 30),
            (3, "cdg", 10),
            (4, "bru", 25),
            (5, "ams", 20),
            (7, "bru", 25),
        ],
        "id long, city string, age long",
    )


class TestRank:
    def test_rank_is_total_order(self, spark):
        got = {
            r["id"]: r["rank"]
            for r in sorted_neighborhood_rank(
                _people(spark), "id", ["city", "age"]
            ).collect()
        }
        assert got == {5: 1, 2: 2, 4: 3, 7: 4, 1: 5, 3: 6}

    def test_id_tiebreak(self, spark):
        # ids 4 and 7 share (bru, 25); the smaller id must rank first
        got = {
            r["id"]: r["rank"]
            for r in sorted_neighborhood_rank(
                _people(spark), "id", ["city"]
            ).collect()
        }
        assert got[4] < got[7] and got[1] < got[4]

    def test_needs_keys(self, spark):
        with pytest.raises(ValueError, match="at least one key"):
            sorted_neighborhood_rank(_people(spark), "id", [])

    def test_rank_survives_many_partitions(self, spark):
        # 100 rows over the full shuffle-partition count: offsets must
        # compose across partitions into one dense 1..n
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        )
        ranks = sorted(
            r["rank"]
            for r in sorted_neighborhood_rank(df, "id", ["k"]).collect()
        )
        assert ranks == list(range(1, 101))


class TestPairs:
    def test_window_2_is_adjacent_only(self, spark):
        got = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(
                _people(spark), "id", ["city", "age"], window=2
            ).collect()
        }
        # adjacent in rank order 5,2,4,7,1,3 — pairs normalised id-ascending
        assert got == {(2, 5), (2, 4), (4, 7), (1, 7), (1, 3)}

    def test_window_3_adds_rank_gap_2(self, spark):
        got = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(
                _people(spark), "id", ["city", "age"], window=3
            ).collect()
        }
        assert got == {
            (2, 5), (2, 4), (4, 7), (1, 7), (1, 3),  # gap 1
            (4, 5), (2, 7), (1, 4), (3, 7),          # gap 2
        }

    def test_fanout_bound(self, spark):
        # n·(w−1) − (tail shortfall): with n=6, w=4 → 5+4+3... = 3+3+3+2+1
        n = sorted_neighborhood_pairs(
            _people(spark), "id", ["city", "age"], window=4
        ).count()
        assert n == 3 + 3 + 3 + 2 + 1

    def test_window_must_be_at_least_2(self, spark):
        # guards Spark's descending sequence(a, b) when a > b
        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(_people(spark), "id", ["city"], window=1)

    def test_pairs_unique_and_ordered(self, spark):
        rows = sorted_neighborhood_pairs(
            _people(spark), "id", ["city"], window=4
        ).collect()
        pairs = [(r["left_id"], r["right_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))
        assert all(left < right for left, right in pairs)


class TestMultipass:
    def test_union_distinct(self, spark):
        df = _people(spark)
        a = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(
                df, "id", ["city", "age"], 2
            ).collect()
        }
        b = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(df, "id", ["age"], 2).collect()
        }
        got = {
            (r["left_id"], r["right_id"])
            for r in multipass_sorted_neighborhood(
                df, "id", [(["city", "age"], 2), (["age"], 2)]
            ).collect()
        }
        assert got == a | b

    def test_needs_a_pass(self, spark):
        with pytest.raises(ValueError, match="pass"):
            multipass_sorted_neighborhood(_people(spark), "id", [])


class TestDeduper:
    def test_verify_filter_and_edge_schema(self, spark):
        d = SortedNeighborhoodDeduper(
            id="id",
            sort_fields=["city", "age"],
            window=3,
            compare_fields=["city"],
        )
        edges = d.dedupe(_people(spark))
        assert [f.name for f in edges.schema.fields] == [
            "left_id", "right_id", "score",
        ]
        assert dict(edges.dtypes)["score"] == "float"
        got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
        # window-3 pairs restricted to same city:
        # (5,2) ams; (4,7),(7,1),(4,1) bru — id-normalised
        assert got == {(2, 5), (4, 7), (1, 7), (1, 4)}

    def test_requires_sort_fields(self, spark):
        with pytest.raises(ValueError, match="sort_fields"):
            SortedNeighborhoodDeduper(id="id").dedupe(_people(spark))

    def test_no_compare_fields_keeps_all_candidates(self, spark):
        d = SortedNeighborhoodDeduper(id="id", sort_fields=["age"], window=2)
        assert d.dedupe(_people(spark)).count() == 5


class TestLayoutInvariance:
    def test_pairs_invariant_to_physical_layout(self, spark):
        # rank is content-defined (ORDER BY key, id), so the pair set must
        # not move with partition count or row order — the determinism the
        # localCheckpoint-pinned partition offsets exist to guarantee
        df = spark.range(500).select(
            F.col("id"), F.pmod(F.xxhash64("id"), F.lit(37)).alias("k")
        )
        base = {
            (r["left_id"], r["right_id"])
            for r in sorted_neighborhood_pairs(df, "id", ["k"], 4).collect()
        }
        for layout in (
            df.repartition(1),
            df.repartition(17, "k"),
            df.orderBy(F.desc("id")),
            df.repartitionByRange(5, F.desc("k")),
        ):
            got = {
                (r["left_id"], r["right_id"])
                for r in sorted_neighborhood_pairs(
                    layout, "id", ["k"], 4
                ).collect()
            }
            assert got == base


class TestDuplicateIds:
    def test_duplicate_ids_never_self_pair(self, spark):
        # two physical rows with the same id land on adjacent ranks; the
        # edge contract forbids left_id == right_id
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "a"), (3, "b")], "id long, k string"
        )
        rows = sorted_neighborhood_pairs(df, "id", ["k"], window=2).collect()
        assert all(r["left_id"] != r["right_id"] for r in rows)
        assert {(r["left_id"], r["right_id"]) for r in rows} == {(1, 2), (2, 3)}


class TestNullKeys:
    """Null sort keys are an engine-dependent trap (Spark sorts nulls
    first, ANSI/DuckDB last): the operator must refuse them by default and
    honor an explicit placement when asked (round-8 guard)."""

    def _with_null(self, spark):
        return spark.createDataFrame(
            [(1, "b"), (2, None), (3, "a"), (4, None)], "id long, k string"
        )

    def test_default_rejects_null_keys(self, spark):
        with pytest.raises(ValueError, match="null value in sort key"):
            sorted_neighborhood_rank(self._with_null(spark), "id", ["k"])
        with pytest.raises(ValueError, match="null value in sort key"):
            SortedNeighborhoodDeduper(
                id="id", sort_fields=["k"], window=2
            ).dedupe(self._with_null(spark))

    def test_nulls_first_matches_spark_order(self, spark):
        got = {
            r["id"]: r["rank"]
            for r in sorted_neighborhood_rank(
                self._with_null(spark), "id", ["k"], nulls="first"
            ).collect()
        }
        # nulls (ids 2,4 — id tiebreak) then a(3) then b(1)
        assert got == {2: 1, 4: 2, 3: 3, 1: 4}

    def test_nulls_last_matches_ansi_order(self, spark):
        got = {
            r["id"]: r["rank"]
            for r in sorted_neighborhood_rank(
                self._with_null(spark), "id", ["k"], nulls="last"
            ).collect()
        }
        # a(3) then b(1) then nulls (ids 2,4)
        assert got == {3: 1, 1: 2, 2: 3, 4: 4}

    def test_nulls_last_keeps_nonnull_order(self, spark):
        # no nulls present: 'last' must reproduce the default ordering
        base = sorted_neighborhood_rank(_people(spark), "id", ["city", "age"])
        wrapped = sorted_neighborhood_rank(
            _people(spark), "id", ["city", "age"], nulls="last"
        )
        assert {(r["id"], r["rank"]) for r in base.collect()} == {
            (r["id"], r["rank"]) for r in wrapped.collect()
        }

    def test_bad_placement_rejected(self, spark):
        with pytest.raises(ValueError, match="nulls must be"):
            sorted_neighborhood_rank(
                _people(spark), "id", ["city"], nulls="high"
            )

    def test_multipass_forwards_placement(self, spark):
        df = self._with_null(spark)
        with pytest.raises(ValueError, match="null value in sort key"):
            multipass_sorted_neighborhood(df, "id", [(["k"], 2)])
        got = {
            (r["left_id"], r["right_id"])
            for r in multipass_sorted_neighborhood(
                df, "id", [(["k"], 2)], nulls="last"
            ).collect()
        }
        # order a(3) b(1) null(2) null(4), window 2 → adjacent pairs
        assert got == {(1, 3), (1, 2), (2, 4)}
