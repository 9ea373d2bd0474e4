"""Scale stress for the round-4 operators: line dedup under a viral line,
BM25 over a wide corpus, salted aggregation under extreme key skew.

Usage: python tools/stress_round4.py [n_docs] [n_events]

Each section generates data distributively (spark.range — nothing driver-
side), runs the operator, and asserts an exact invariant, so the check is
"correct at scale", not just "finished".
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.curation import dedupe_lines  # noqa: E402
from matchbox_spark.operators.search import bm25_scores  # noqa: E402
from matchbox_spark.operators.skew import salted_agg  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark(app_name="stress_round4", shuffle_partitions=64)

    # -- line dedup: every doc carries the SAME viral footer line ---------
    # (the adversarial case for the first-occurrence aggregate: one line
    # with n_docs occurrences). Two unique lines + one viral line per doc.
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("unique-a-"), F.col("id")),
            F.lit("viral boilerplate footer"),
            F.concat(F.lit("unique-b-"), F.col("id")),
        ).alias("text"),
    )
    t0 = time.time()
    out = dedupe_lines(docs, "doc_id", "text")
    agg = out.agg(
        F.sum("n_kept").alias("k"), F.sum("n_dropped").alias("d")
    ).first()
    dt = time.time() - t0
    kept, dropped = int(agg["k"]), int(agg["d"])
    assert kept == 2 * n_docs + 1, (kept, n_docs)
    assert dropped == n_docs - 1, (dropped, n_docs)
    print(
        f"dedupe_lines: {3 * n_docs:,} lines, viral line x{n_docs:,} -> "
        f"kept {kept:,} dropped {dropped:,} EXACT in {dt:.1f}s"
    )

    # -- span dedup: the SAME 15-word slogan in every 4th doc ------------
    slogan = " ".join(f"s{i}" for i in range(15))
    # filler tokens embed the doc id, so ONLY the slogan repeats corpus-wide
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(17)),
            lambda i: F.concat(F.lit("t"), F.col("id"), F.lit("_"), i),
        ),
        " ",
    )
    sdocs = spark.range(n_docs // 10).select(
        F.col("id").alias("doc_id"),
        F.concat(
            filler,
            F.when(F.col("id") % 4 == 0, F.lit(" " + slogan)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    from matchbox_spark.operators.dedup import span_dedupe

    t0 = time.time()
    sd = span_dedupe(sdocs, "doc_id", "text", n=13)
    agg = sd.agg(F.sum("n_dropped").alias("d")).first()
    dt = time.time() - t0
    n_slogan_docs = (n_docs // 10 + 3) // 4
    # every slogan doc except the first loses exactly the 15 slogan words
    assert int(agg["d"]) == 15 * (n_slogan_docs - 1), (agg["d"], n_slogan_docs)
    print(
        f"span_dedupe: {n_docs // 10:,} docs, slogan viral in "
        f"{n_slogan_docs:,} -> dropped {int(agg['d']):,} tokens EXACT in "
        f"{dt:.1f}s"
    )

    # -- BM25: 1M docs, zipf-ish term mix --------------------------------
    corpus = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha"),
            F.when(F.col("id") % 10 == 0, F.lit("target")).otherwise(
                F.lit("filler")
            ),
            F.lit("beta gamma delta"),
            F.when(F.col("id") % 100 == 0, F.lit("target")).otherwise(
                F.lit("pad")
            ),
        ).alias("text"),
    )
    t0 = time.time()
    scored = bm25_scores(corpus, "doc_id", "text", ["target"])
    n_hits = scored.count()
    top = scored.first()
    dt = time.time() - t0
    assert n_hits == n_docs // 10, n_hits
    assert top["doc"] % 100 == 0 and top["n_terms"] == 1  # tf=2 docs rank first
    print(
        f"bm25: {n_docs:,} docs -> {n_hits:,} hits, top doc {top['doc']} "
        f"(tf=2) in {dt:.1f}s"
    )

    # -- PageRank: 1M-node bidirectional chain, 3 power iterations -------
    n_nodes = n_docs
    chain = spark.range(n_nodes - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    ed = chain.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        chain.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = ed.groupBy("src").agg(F.count("*").cast("double").alias("d"))
    t0 = time.time()
    pr = spark.range(n_nodes).select(
        F.col("id"), (F.lit(1.0) / n_nodes).alias("pr")
    )
    for _ in range(3):
        contrib = (
            ed.join(pr.select(F.col("id").alias("src"), "pr"), "src")
            .join(deg, "src")
            .select(
                "dst",
                F.round(F.col("pr") / F.col("d"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        m = contrib.groupBy("dst").agg(F.sum("c").cast("double").alias("s"))
        nodes = spark.range(n_nodes)
        pr = (
            nodes.join(m, nodes["id"] == m["dst"], "left")
            .select(
                "id",
                F.round(
                    0.15 / n_nodes + 0.85 * F.coalesce(F.col("s"), F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)  # truncate the iteration lineage
        )
    stats = pr.agg(
        F.sum("pr").alias("tot"), F.min("pr").alias("lo"), F.max("pr").alias("hi")
    ).first()
    dt = time.time() - t0
    # chain graph: rank mass conserved (endpoints forward half, interior all)
    assert abs(stats["tot"] - 1.0) < 1e-3, stats["tot"]
    assert stats["lo"] < stats["hi"]  # endpoints rank below interior
    print(
        f"pagerank: {n_nodes:,} nodes x3 iterations, rank mass "
        f"{stats['tot']:.6f} in {dt:.1f}s"
    )

    # -- salted agg: 90% of rows on ONE key ------------------------------
    events = spark.range(n_events).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("key"),
        F.col("id").alias("event"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    t0 = time.time()
    out = salted_agg(
        events,
        ["key"],
        {"n": ("*", "count"), "s": ("v", "sum")},
        n_salts=64,
        salt_expr=F.pmod(F.xxhash64("event"), F.lit(64)),
    )
    hot = out.where(F.col("key") == 0).first()
    total = out.agg(F.sum("n")).first()[0]
    dt = time.time() - t0
    assert total == n_events, total
    exact_hot = events.where(F.col("key") == 0).count()
    assert hot["n"] == exact_hot, (hot["n"], exact_hot)
    print(
        f"salted_agg: {n_events:,} rows, hot key holds {hot['n']:,} "
        f"({100.0 * hot['n'] / n_events:.0f}%) EXACT in {dt:.1f}s"
    )


if __name__ == "__main__":
    main()
