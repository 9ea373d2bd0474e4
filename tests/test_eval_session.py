"""EvalSession: the programmatic judging loop over a built scenario."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.eval_session import EvalSession
from matchbox_spark.scenarios import scenario


@pytest.fixture()
def session(spark):
    s = scenario(spark, "dedupe")
    return EvalSession(
        s.dag, resolver=s.resolver, sources=["crn"], user="alice", n=50
    )


def test_queue_loads_sampled_clusters(session):
    assert session.total_count() > 0
    item = session.current()
    assert item is not None
    assert len(item.leaves) >= 1
    assert all(m["source"] == "crn" for m in item.members)


def test_skip_requeues_at_back(session):
    first = session.current()
    n = session.total_count()
    session.skip()
    assert session.total_count() == n
    assert session.queue[-1] is first


def test_submit_endorsing_whole_cluster_scores_perfectly(session):
    # endorse every shown cluster exactly as resolved → model matches the
    # judgements → precision == recall == 1.0 (for clusters with >1 leaf)
    judged = 0
    while session.current() is not None and judged < 10:
        item = session.current()
        session.submit([item.leaves])
        judged += 1
    p, r = session.precision_recall()
    assert p == 1.0 and r == 1.0


def test_submit_splitting_cluster_lowers_precision(spark):
    s = scenario(spark, "dedupe")
    sess = EvalSession(s.dag, resolver=s.resolver, sources=["crn"], n=50)
    split = 0
    while sess.current() is not None:
        item = sess.current()
        if len(item.leaves) >= 2 and split == 0:
            # split the first multi-leaf cluster: one singleton + the rest
            sess.submit([[item.leaves[0]], item.leaves[1:]])
            split += 1
        elif len(item.leaves) >= 2:
            sess.submit([item.leaves])
        else:
            sess.skip()
            break
    assert split == 1
    p, r = sess.precision_recall()
    # model pairs crossing the split are judged negative → precision < 1;
    # every judged-positive pair is still a model pair → recall == 1
    assert p < 1.0
    assert r == 1.0


def test_submit_validates_partition(session):
    item = session.current()
    with pytest.raises(ValueError, match="partition"):
        session.submit([item.leaves + [999_999]])
    with pytest.raises(ValueError, match="partition"):
        session.submit([item.leaves[:-1]] if len(item.leaves) > 1 else [[]])


def test_judgement_tables_shape(session):
    item = session.current()
    session.submit([item.leaves])
    j = session.judgements()
    assert j.columns == ["user_name", "shown", "endorsed"]
    assert j.count() == 1
    ts = session.judgements_ts()
    assert dict(ts.dtypes)["ts"] == "timestamp"


def test_recency_filter_excludes_judged_clusters(spark):
    s = scenario(spark, "dedupe")
    first = EvalSession(s.dag, resolver=s.resolver, sources=["crn"], n=50)
    item = first.current()
    first.submit([item.leaves])
    second = EvalSession(
        s.dag,
        resolver=s.resolver,
        sources=["crn"],
        n=50,
        prior_judgements_ts=first.judgements_ts().withColumn(
            "ts", F.current_timestamp()
        ),
    )
    roots = {i.root for i in second.queue}
    assert item.root not in roots
    # first popped the judged item, so both queues now hold all-but-one
    assert second.total_count() == first.total_count()
