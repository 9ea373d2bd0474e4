"""Atomic-snapshot persistence pins (round 8, ADVICE r7).

``Catalog.save`` writes every table into one versioned snapshot directory
and flips a single ``steps.json`` pointer last, so no crash window can
surface a table set mixing two snapshots. These tests pin the pointer
semantics, crash recovery, legacy (format-1) loading, and snapshot GC.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from matchbox_spark.plans.catalog import Catalog


def _mk(spark, path, score=0.5):
    cat = Catalog(spark, str(path))
    edges = spark.createDataFrame(
        [(1, 2, score)], "left_id long, right_id long, score float"
    )
    cat.insert_model_edges("m", edges)
    return cat


def test_save_load_roundtrip_and_gc(spark, tmp_path):
    p = tmp_path / "cat"
    cat = _mk(spark, p)
    cat.save()
    assert json.loads((p / "steps.json").read_text())["snapshot"] == 1
    # mutate + save again: pointer advances; the immediate predecessor is
    # KEPT one generation for in-flight readers (ADVICE r8)
    cat.insert_model_edges("m2", spark.createDataFrame(
        [(3, 4, 0.9)], "left_id long, right_id long, score float"
    ))
    cat.save()
    meta = json.loads((p / "steps.json").read_text())
    assert meta["snapshot"] == 2 and set(meta["steps"]) == {"m", "m2"}
    assert sorted(os.listdir(p / "snapshots")) == ["1", "2"]
    re = Catalog(spark, str(p))
    assert re.model_edges.count() == 2
    # and load → mutate → save remains safe (the old data-loss class);
    # the third save collects snapshot 1 (now two generations stale)
    re.drop_step("m2")
    re.save()
    assert sorted(os.listdir(p / "snapshots")) == ["2", "3"]
    assert Catalog(spark, str(p)).model_edges.count() == 1


def test_reader_of_previous_snapshot_survives_one_save(spark, tmp_path):
    """A lazy DataFrame held from the PREVIOUS pointer must stay readable
    across one save by another handle (GC defers one generation)."""
    p = tmp_path / "cat"
    cat = _mk(spark, p)
    cat.save()
    reader = Catalog(spark, str(p))
    held = reader.model_edges  # lazy scan of snapshot 1
    writer = Catalog(spark, str(p))
    writer.insert_model_edges("m2", spark.createDataFrame(
        [(3, 4, 0.9)], "left_id long, right_id long, score float"
    ))
    writer.save()  # snapshot 2 live; snapshot 1 must survive this save
    assert held.count() == 1


def test_crash_before_pointer_flip_preserves_old_snapshot(spark, tmp_path):
    """A half-written NEW snapshot without the pointer flip must be
    invisible: load serves the previous snapshot completely."""
    p = tmp_path / "cat"
    cat = _mk(spark, p)
    cat.save()
    # simulate a crash mid-save of snapshot 2: tables partially written,
    # steps.json NOT flipped
    (p / "snapshots" / "2").mkdir()
    shutil.copytree(p / "snapshots" / "1" / "clusters",
                    p / "snapshots" / "2" / "clusters")
    re = Catalog(spark, str(p))
    assert re._snapshot_id == 1
    assert re.model_edges.count() == 1
    assert "m" in re.steps
    # the next save supersedes the orphan in place (snapshot 1 is kept one
    # generation for in-flight readers)
    re.save()
    assert sorted(os.listdir(p / "snapshots")) == ["1", "2"]
    assert json.loads((p / "steps.json").read_text())["snapshot"] == 2


def test_legacy_v1_layout_still_loads_and_upgrades(spark, tmp_path):
    """A catalog persisted by the old per-table layout (steps.json = bare
    steps dict, tables beside it) loads, and its first save migrates it to
    the snapshot layout and removes the legacy directories."""
    p = tmp_path / "cat"
    cat = _mk(spark, p)
    # hand-write the v1 layout
    os.makedirs(p, exist_ok=True)
    for name in cat._table_names():
        getattr(cat, name).write.mode("overwrite").parquet(str(p / name))
    (p / "steps.json").write_text(json.dumps(cat.steps))

    re = Catalog(spark, str(p))
    assert re.model_edges.where(F.col("step") == "m").count() == 1
    re.save()
    meta = json.loads((p / "steps.json").read_text())
    assert meta["snapshot"] == 1
    assert not (p / "model_edges").exists()  # legacy dirs collected
    assert Catalog(spark, str(p)).model_edges.count() == 1


def test_concurrent_writer_detected(spark, tmp_path):
    """Round 11: two interleaved writers to one path — the second save must
    raise ConcurrentWriterError instead of silently clobbering the first
    writer's snapshot (the single-writer contract, now enforced)."""
    import pytest

    from matchbox_spark.plans.catalog import ConcurrentWriterError

    p = tmp_path / "cat"
    a = _mk(spark, p, score=0.5)
    a.save()

    # writer B opens the same path (sees snapshot 1), writer A saves again
    # (pointer moves to 2), then B saves — B must lose loudly
    b = Catalog(spark, str(p))
    b.insert_model_edges("mb", spark.createDataFrame(
        [(7, 8, 0.7)], "left_id long, right_id long, score float"
    ))
    a.insert_model_edges("ma", spark.createDataFrame(
        [(5, 6, 0.6)], "left_id long, right_id long, score float"
    ))
    a.save()
    with pytest.raises(ConcurrentWriterError, match="another\\s+writer"):
        b.save()
    # A's snapshot survives untouched
    meta = json.loads((p / "steps.json").read_text())
    assert meta["snapshot"] == 2 and set(meta["steps"]) == {"m", "ma"}
    # A itself can keep saving (its view matches the pointer)
    a.save()
    assert json.loads((p / "steps.json").read_text())["snapshot"] == 3


def test_concurrent_writer_detected_at_flip(spark, tmp_path):
    """The race window between table writes and the pointer flip is also
    guarded: a pointer that moves mid-save loses the flip."""
    import pytest

    from matchbox_spark.plans.catalog import ConcurrentWriterError

    p = tmp_path / "cat"
    a = _mk(spark, p, score=0.5)
    a.save()
    # simulate a concurrent flip landing between A's two generation checks
    orig = type(a)._check_snapshot_generation
    calls = {"n": 0}

    def flip_between(self):
        calls["n"] += 1
        orig(self)
        if calls["n"] == 1:  # after the fail-fast check passes...
            meta = json.loads((p / "steps.json").read_text())
            meta["snapshot"] = 99  # ...another writer flips the pointer
            (p / "steps.json").write_text(json.dumps(meta))

    a._check_snapshot_generation = flip_between.__get__(a)
    with pytest.raises(ConcurrentWriterError):
        a.save()
