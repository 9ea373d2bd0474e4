"""Programmatic evaluation-judging session — the reference CLI's loop as a
thin driver API.

The reference wraps this flow in a Textual TUI
(reference src/matchbox/client/cli/eval/app.py:26-409: EvaluationQueue /
CLIEvaluationSession / submit/skip actions); the engine-side surface is the
same five verbs, so a notebook or service can run judging without a
terminal app:

    sess = EvalSession(dag, resolver="resolve", sources=["cust"], user="al")
    item = sess.current()          # shown cluster + its source rows
    sess.submit([[1, 2], [3]])     # partition the shown leaves → judgement
    sess.skip()                    # requeue the current item at the back
    sess.precision_recall()        # model vs accumulated judgements

Scale note: the queue and judgement log are driver-resident BY DESIGN — a
human judging session sees at most a few hundred sampled clusters (drawn
via the deterministic O5 sample), while the expansion/net-count/PR maths
stay DataFrame-side in :mod:`matchbox_spark.eval`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.eval import (
    eval_samples,
    filter_recently_judged,
    precision_recall,
)


@dataclass
class EvalItem:
    """One shown cluster: its root id and member (leaf, source, key) rows."""

    root: int
    members: list[dict]  # {"leaf": int, "source": str, "key": str}

    @property
    def leaves(self) -> list[int]:
        return sorted({m["leaf"] for m in self.members})


@dataclass
class _Judgement:
    user: str
    shown: int
    endorsed: int
    ts: str


class EvalSession:
    """A judging queue over deterministically-sampled resolved clusters."""

    def __init__(
        self,
        dag,
        resolver: str,
        sources: list[str],
        user: str = "default",
        n: int = 100,
        cutoff_days: int = 365,
        prior_judgements_ts: DataFrame | None = None,
    ):
        self.dag = dag
        self.user = user
        self.resolver = resolver
        self.sources = list(sources)
        self._judgements: list[_Judgement] = []
        self._synthetic: dict[int, list[int]] = {}  # endorsed id → leaves
        self._next_synthetic = -1  # negative ids can't collide with clusters
        self._seq = 0

        samples = eval_samples(
            dag.catalog, resolver, dag.resolver_lineage(resolver), self.sources, n=n
        )
        if prior_judgements_ts is not None:
            keep = filter_recently_judged(
                samples.select(F.col("root").alias("cluster_id")).distinct(),
                prior_judgements_ts,
                cutoff_days=cutoff_days,
            ).withColumnRenamed("cluster_id", "root")
            samples = samples.join(keep, "root", "left_semi")
        rows = samples.collect()
        by_root: dict[int, list[dict]] = {}
        for r in rows:
            by_root.setdefault(r["root"], []).append(
                {"leaf": r["leaf"], "source": r["source"], "key": r["key"]}
            )
        self.queue: list[EvalItem] = [
            EvalItem(root=root, members=members)
            for root, members in sorted(by_root.items())
        ]

    # -- queue verbs (reference app.py:38-84) --------------------------------

    def total_count(self) -> int:
        return len(self.queue)

    def current(self) -> EvalItem | None:
        return self.queue[0] if self.queue else None

    def skip(self) -> None:
        """Requeue the current item at the back (action_skip)."""
        if self.queue:
            self.queue.append(self.queue.pop(0))

    def submit(self, groups: list[list[int]]) -> None:
        """Record the current item's judgement: ``groups`` partitions the
        shown leaves into endorsed entities (action_submit). A group that
        exactly matches an existing cluster endorses it; otherwise a
        synthetic endorsed group is minted (negative id) with its own
        expansion entry."""
        item = self.current()
        if item is None:
            raise RuntimeError("queue is empty")
        claimed = sorted(leaf for g in groups for leaf in g)
        if claimed != item.leaves:
            raise ValueError(
                f"groups must partition the shown leaves {item.leaves}, got {claimed}"
            )
        self._seq += 1
        ts = f"2024-01-01 00:00:{min(self._seq, 59):02d}"
        for g in groups:
            leaves = sorted(set(g))
            if len(leaves) == 1:
                endorsed = leaves[0]  # singleton: endorse the leaf itself
            else:
                endorsed = self._next_synthetic
                self._next_synthetic -= 1
                self._synthetic[endorsed] = leaves
            self._judgements.append(
                _Judgement(self.user, item.root, endorsed, ts)
            )
        self.queue.pop(0)

    # -- judgement state ------------------------------------------------------

    def judgements(self) -> DataFrame:
        """(user_name, shown, endorsed) — the reference judgement table."""
        spark = self.dag.spark
        rows = [(j.user, j.shown, j.endorsed) for j in self._judgements]
        return spark.createDataFrame(
            rows or [], "user_name string, shown long, endorsed long"
        )

    def judgements_ts(self) -> DataFrame:
        """(shown, ts) — feed for recency filtering of future sessions."""
        spark = self.dag.spark
        rows = [(j.shown, j.ts) for j in self._judgements]
        df = spark.createDataFrame(rows or [], "shown long, ts string")
        return df.withColumn("ts", F.col("ts").cast("timestamp"))

    def expansion(self) -> DataFrame:
        """(root, leaves) for every shown cluster and synthetic endorsed
        group — the J10 expansion table for this session's judgements."""
        spark = self.dag.spark
        shown = {
            item.root: item.leaves
            for item in self._all_items()
        }
        rows = [(root, leaves) for root, leaves in shown.items()]
        rows += [(g, leaves) for g, leaves in self._synthetic.items()]
        return spark.createDataFrame(rows or [], "root long, leaves array<long>")

    def _all_items(self):
        judged_roots = {j.shown for j in self._judgements}
        items = list(self.queue)
        # reconstruct judged items' membership from the recorded groups
        for root in judged_roots:
            leaves = sorted(
                {
                    leaf
                    for j in self._judgements
                    if j.shown == root
                    for leaf in self._synthetic.get(j.endorsed, [j.endorsed])
                }
            )
            items.append(EvalItem(root=root, members=[{"leaf": leaf, "source": "", "key": ""} for leaf in leaves]))
        return items

    # -- scoring --------------------------------------------------------------

    def precision_recall(self) -> tuple[float, float]:
        """Pair precision/recall of the session's resolver clustering against
        the accumulated judgements."""
        from matchbox_spark.plans.query import unified_query

        proj = unified_query(
            self.dag.catalog,
            self.dag.resolver_lineage(self.resolver),
            self.sources,
            level="key",
        )
        model = proj.select(
            F.col("id").alias("root"), F.col("leaf_id").alias("leaf")
        ).dropDuplicates()
        return precision_recall(
            [model], self.judgements(), self.expansion()
        )[0]
