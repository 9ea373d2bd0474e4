"""Incremental source indexing + entity resolution via Structured Streaming.

The reference is batch-only (SURVEY §1.4/§2.12 — its "real-time" matching is
a key lookup over precomputed clusters); this module is the Spark-native
extension it leaves open: new source rows arrive as a stream, each
micro-batch is content-indexed (H1/A1) and merged into the catalog
APPEND-ONLY (U6 insert-if-absent), so the cluster store stays current
without re-indexing the corpus and without rewriting accumulated state.

``foreachBatch`` is the right tool: the per-batch body reuses the exact
batch operators (same hash recipe, same catalog semantics), and exactly-once
state comes from checkpointing + the idempotence of the catalog's delta
inserts (replaying a batch appends nothing).

Scale shape per micro-batch:

- **Indexing** (`incremental_index_stream`): O(delta) state appends; the
  accumulated ``clusters``/``cluster_keys`` tables are only *read* (two
  anti-joins), never rewritten.
- **Resolution** (`incremental_resolve_stream`): with ``blocking_fields``
  set, only rows sharing a blocking value with the batch are re-linked
  (delta-link); previously resolved components are carried as star edges
  (one synthetic edge per member — O(touched), not O(past edges)) so a
  bridging record can still merge clusters formed in earlier batches. New
  edges APPEND into the persisted edge set. Models whose blocking values
  are COMPUTED rather than raw fields (LSH band keys — ``MinHashDeduper``,
  ``SimHashDeduper``) declare ``delta_block_keys`` instead: each leaf's
  keys persist once into the catalog's ``block_keys`` index and a batch
  prunes accumulated state with one semi-join, so signatures are never
  recomputed over state. Without either contract the model re-runs over
  all accumulated rows (general-correct for non-monotone models;
  documented O(accumulated) per batch, amortisable via
  ``resolve_cadence``).

Checkpoint/state coupling: the streaming checkpoint is durable but a
``Catalog(spark)`` without a path is not. Resuming a checkpoint against a
catalog that is missing the earlier batches' state would silently resolve
only post-restart data — both entry points detect that (first seen batch_id
> 0 against a step-less catalog) and raise instead.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from matchbox_spark.functions.hashing import row_hash_expr
from matchbox_spark.operators.lsh_linkers import AUTO
from matchbox_spark.plans.catalog import Catalog
from matchbox_spark.plans.resolvers import _free_checkpoint

logger = logging.getLogger(__name__)


def _guard_checkpoint_state(catalog: Catalog, step: str, batch_id: int) -> None:
    """Detect a durable checkpoint replayed against a fresh, empty catalog.

    The file-source checkpoint marks earlier files processed; if the catalog
    holds no state for ``step`` while the checkpoint says batches already
    ran, every pre-restart row would silently vanish from the resolved
    output. Fail fast instead.

    Callers invoke this only when the current RUN did not witness batch 0
    (i.e. the checkpoint genuinely resumed) — a run that starts at batch 0
    can accumulate any number of empty leading micro-batches (Kafka
    ``startingOffsets=latest``, an availableNow start before files exist)
    without tripping the guard. One case stays indistinguishable and still
    raises: a RESTART whose pre-restart batches were all empty — the
    checkpoint alone cannot prove no data ran, so use a fresh
    checkpoint_dir there.
    """
    if step not in catalog.steps:
        raise RuntimeError(
            f"streaming checkpoint resumes at batch {batch_id} but the "
            f"catalog has no state for step {step!r}: earlier micro-batches "
            "were marked processed by the checkpoint yet are absent here. "
            "Either restart with a fresh checkpoint_dir, or reopen the "
            "catalog that processed the earlier batches "
            "(Catalog(spark, path=...) / Catalog.load_tables)."
        )


def _index_batch(
    catalog: Catalog,
    step: str,
    batch: DataFrame,
    key_field: str,
    index_fields: list[str],
    value_fields: list[str] | None = None,
):
    """H1-hash a batch, group to a content index, merge append-only (U6).

    With ``value_fields`` (the r14 delta-pair map path) the per-hash FIRST
    of each named field rides the same collect, string-cast for stable
    driver-side equality — legal because the fields are part of the hashed
    content (caller gates ``value_fields ⊆ index_fields``), so they are
    constant within a hash group. Returns the catalog's mapped batch index
    (a pandas frame with assigned ``cluster_id``) in that mode, or None
    when the driver twin cannot run — the caller must then re-call without
    ``value_fields`` (nothing was inserted)."""
    cols = [
        row_hash_expr(batch.schema, sorted(index_fields)).alias("hash"),
        F.col(key_field).cast("string").alias("key"),
    ]
    if value_fields:
        cols += [
            F.col(f).cast("string").alias(f"_bv_{i}")
            for i, f in enumerate(value_fields)
        ]
    hashed = batch.select(*cols)
    aggs = [F.sort_array(F.collect_list("key")).alias("keys")]
    if value_fields:
        aggs += [
            F.first(f"_bv_{i}").alias(f"_bv_{i}")
            for i in range(len(value_fields))
        ]
    index = hashed.groupBy("hash").agg(*aggs)
    if value_fields:
        return catalog.insert_source_index_delta_mapped(step, index)
    catalog.insert_source_index_delta(step, index)
    return None


def incremental_index_stream(
    stream: DataFrame,
    catalog: Catalog,
    step: str,
    key_field: str,
    index_fields: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Index a streaming source into the catalog, one micro-batch at a time.

    Each batch: H1 row hash over sorted index fields → group hashes → merge
    into ``catalog`` under ``step`` via the append-only delta insert
    (insert-if-absent; previously seen content just accumulates new keys).
    Per-batch state cost is O(batch); accumulated state is never rewritten.
    """

    run = {"from_start": False}  # did THIS run witness batch 0?

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch_id == 0:
            run["from_start"] = True
        if batch.isEmpty():
            return
        if not run["from_start"]:
            _guard_checkpoint_state(catalog, step, batch_id)
        _index_batch(catalog, step, batch, key_field, index_fields)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _touched_star_edges(
    catalog: Catalog, resolver_step: str, batch_leaves: DataFrame
) -> tuple[DataFrame | None, DataFrame | None]:
    """Star edges for ONLY the prior components a batch can change.

    ``batch_leaves`` (one ``leaf_id`` column) is the leaf-id set of the
    batch's blocked superset — the only rows a block-local model can link
    this batch, hence the only leaves through which an existing component
    can gain an edge. Components intersecting that set compress to one
    ``(min_leaf, leaf)`` star edge per member; everything else is untouched
    and is neither read into the CC nor rewritten. Returns ``(star_edges,
    touched_root_ids)`` — the roots are eagerly materialised (they are the
    retirement candidates after the merge) — or ``(None, None)`` before the
    step first exists. Per-batch cost: one semi-join over the assignment
    map plus O(touched members) star rows; never O(all resolved entities).
    """
    if resolver_step not in catalog.steps:
        return None, None

    # Driver fast path (optimization r13): while the catalog's claim +
    # contains mirrors are live (every resolver mutation so far was
    # driver-local), the prior assignment map IS {(root, leaf) for root in
    # claims[step] for leaf in contains_mirror[root]} — so one bounded
    # collect of the batch-leaf ids (the same size-adaptive budget the CC
    # escape uses; an over-budget blocked superset falls through to the
    # distributed semi-joins) replaces the touched-roots checkpoint job,
    # and the stars + roots upload as LocalRelations that the catalog's
    # merge twin consumes without further jobs. Same semantics row for
    # row: touched = claimed roots whose leaf set intersects the batch
    # leaves; stars = (min leaf, other leaf) per touched root.
    rcmirror = getattr(catalog, "_driver_rc", None)
    kmirror = getattr(catalog, "_driver_contains", None)
    if rcmirror is not None and kmirror is not None:
        from matchbox_spark.plans.resolvers import _driver_cc_edge_limit

        spark = batch_leaves.sparkSession
        limit = _driver_cc_edge_limit(spark)
        # count-then-collect, not limit(n+1).toPandas(): the limit probe
        # funnels through CollectLimitExec's single partition and converts
        # single-threaded (~3x slower at ~900k rows — same measurement as
        # _collect_edges_if_small); both call sites pass frames derived
        # from eagerly-checkpointed batch state, so the count is one cheap
        # job and the collect stays a parallel Arrow transfer. A caller
        # that already holds the leaves driver-side (the r14 delta-pair
        # map path) attaches them as _mb_local_pdf — zero jobs then.
        pdf = getattr(batch_leaves, "_mb_local_pdf", None)
        if pdf is None and batch_leaves.count() <= limit:
            pdf = batch_leaves.toPandas()
        if pdf is not None and len(pdf) <= limit:
            import pandas as pd

            leafset = {int(v) for v in pdf[pdf.columns[0]].tolist()}
            rc_set = rcmirror.get(resolver_step, set())
            star_rows: list[tuple[int, int]] = []
            troots: list[int] = []
            for r in sorted(rc_set):
                leaves = kmirror.get(r, ())
                if any(l in leafset for l in leaves):
                    troots.append(r)
                    rep = min(leaves)
                    star_rows.extend(
                        (rep, leaf) for leaf in leaves if leaf != rep
                    )
            tr_pdf = pd.DataFrame(
                {"root_id": pd.array(troots, dtype="int64")}
            )
            touched_roots = spark.createDataFrame(tr_pdf, "root_id long")
            touched_roots._mb_local_pdf = tr_pdf
            st_pdf = pd.DataFrame(
                {
                    "left_id": pd.array(
                        [s[0] for s in star_rows], dtype="int64"
                    ),
                    "right_id": pd.array(
                        [s[1] for s in star_rows], dtype="int64"
                    ),
                    "score": pd.array(
                        [1.0] * len(star_rows), dtype="float32"
                    ),
                }
            )
            stars = spark.createDataFrame(
                st_pdf, "left_id long, right_id long, score float"
            )
            stars._mb_local_pdf = st_pdf
            return stars, touched_roots

    from matchbox_spark.plans.query import resolver_assignments

    prev = resolver_assignments(catalog, resolver_step)
    # no broadcast hints on either semi-join: batch_leaves is the BLOCKED
    # SUPERSET of the batch (a hot blocking value — boilerplate default —
    # makes it O(accumulated state)), and touched_roots inherits that
    # cardinality; a forced broadcast would collect it to the driver every
    # micro-batch and OOM at scale. Unhinted, the planner shuffles when
    # big and AQE still converts to broadcast at runtime when the measured
    # size is small (the common case the hint was chasing).
    touched_roots = (
        prev.join(batch_leaves, "leaf_id", "left_semi")
        .select("root_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    members = prev.join(touched_roots, "root_id", "left_semi")
    reps = members.groupBy("root_id").agg(F.min("leaf_id").alias("_rep"))
    stars = (
        members.join(reps, "root_id")
        .where(F.col("leaf_id") != F.col("_rep"))
        .select(
            F.col("_rep").alias("left_id"),
            F.col("leaf_id").alias("right_id"),
            F.lit(1.0).cast("float").alias("score"),
        )
    )
    return stars, touched_roots


def _delta_pair_batch(
    catalog: Catalog,
    model_step: str,
    resolver_step: str,
    resolver_method,
    bidx,
    dcontract: dict,
    dmap: dict,
    spark,
) -> bool:
    """One micro-batch through the driver block map (optimization r14,
    guide §1.2 "the distributed algorithm" / §2.4 remove shuffles outright).

    Under the model's :meth:`delta_pairwise_contract` (edges = every
    unordered distinct-id pair within a group of equal non-null
    unique-field tuples, fixed score), a batch can only CREATE pairs that
    touch one of its own rows — old×old pairs were created by the batch
    that delivered the later old row. So instead of rebuilding the
    O(accumulated) blocked superset and re-expanding every touched group's
    full pair set per batch, keep a driver map ``tuple → member ids`` and
    emit exactly the delta pairs (old×new ∪ new×new per block):

    - ``new_edges`` equals the distributed branch's post-anti-join delta
      by the contract (and still flows through
      ``insert_model_edges_delta``'s anti-join, which makes batch replay a
      no-op exactly as before);
    - ``batch_leaves`` (the touched blocks' member union) is a SUBSET of
      the distributed OR-superset that still contains every component
      that can gain an edge (edges only form inside tuple blocks), and a
      root starred under the wider set but untouched by any edge re-forms
      to its own content-addressed id — byte-identical terminal state;
    - CC input = delta pairs ∪ stars: every old×old pair's endpoints are
      members of a prior (hence starred) component, so connectivity —
      and therefore the assignments — matches the distributed branch.

    ``max_group_size`` transfers: the moment a block's accumulated
    distinct-member count exceeds the cap, the distributed branch drops
    the whole group from that batch's pair output (earlier appends
    persist) — the map path stops emitting at the same boundary.

    Budget: pairs emitted this batch and total mapped members both bound
    by the CC driver edge limit. Returns False BEFORE any mutation when a
    batch would blow it — the caller falls back to the distributed
    blocked-superset branch and retires the map for the rest of the run.
    """
    import pandas as pd

    from matchbox_spark.plans.resolvers import _driver_cc_edge_limit

    limit = _driver_cc_edge_limit(spark)
    blocks: dict = dmap["blocks"]
    cap = dcontract["cap"]
    ids = bidx["cluster_id"].tolist()
    valcols = [
        bidx[f"_bv_{i}"].tolist() for i in range(len(dcontract["raw"]))
    ]

    # phase 1 — no mutation: the batch's new member ids per block, pair
    # count, and the budget check
    add: dict[tuple, set] = {}
    touched: set = set()
    for j, cid in enumerate(ids):
        vals = tuple(col[j] for col in valcols)
        if any(v is None for v in vals):
            continue  # NaiveDeduper's na.drop: a null field never pairs
        touched.add(vals)
        prior = blocks.get(vals)
        pend = add.setdefault(vals, set())
        if (prior is not None and cid in prior) or cid in pend:
            continue  # replayed / duplicate-content row: already a member
        pend.add(int(cid))
    total = 0
    n_new_members = 0
    for vals, pend in add.items():
        n_old = len(blocks.get(vals) or ())
        g = n_old + len(pend)
        n_new_members += len(pend)
        if not pend or g < 2 or (cap is not None and g > cap):
            continue
        total += n_old * len(pend) + len(pend) * (len(pend) - 1) // 2
    if total > limit or dmap["rows"] + n_new_members > limit:
        return False

    # phase 2 — mutate the map, emit exactly the delta pairs
    lefts: list[int] = []
    rights: list[int] = []
    for vals, pend in add.items():
        s = blocks.setdefault(vals, set())
        g = len(s) + len(pend)
        if pend and g >= 2 and (cap is None or g <= cap):
            new_sorted = sorted(pend)
            for i, nid in enumerate(new_sorted):
                for oid in s:
                    if nid < oid:
                        lefts.append(nid)
                        rights.append(oid)
                    else:
                        lefts.append(oid)
                        rights.append(nid)
                for oid in new_sorted[i + 1 :]:
                    lefts.append(nid)
                    rights.append(oid)
        s.update(pend)
    dmap["rows"] += n_new_members

    epdf = pd.DataFrame(
        {
            "left_id": pd.array(lefts, dtype="int64"),
            "right_id": pd.array(rights, dtype="int64"),
            "score": pd.array(
                [dcontract["score"]] * len(lefts), dtype="float32"
            ),
        }
    )
    new_edges = spark.createDataFrame(
        epdf, "left_id long, right_id long, score float"
    )
    new_edges._mb_local_pdf = epdf
    new_edges._mb_driver_resident = True
    catalog.insert_model_edges_delta(model_step, new_edges)

    leaf_set: set = set()
    for vals in touched:
        leaf_set.update(blocks.get(vals) or ())
    bl_pdf = pd.DataFrame(
        {"leaf_id": pd.array(sorted(leaf_set), dtype="int64")}
    )
    batch_leaves = spark.createDataFrame(bl_pdf, "leaf_id long")
    batch_leaves._mb_local_pdf = bl_pdf
    batch_leaves._mb_driver_resident = True
    stars, touched_roots = _touched_star_edges(
        catalog, resolver_step, batch_leaves
    )
    cc_edges = _attach_cc_pdf(
        new_edges if stars is None else new_edges.unionByName(stars),
        epdf,
        stars,
    )
    assignments = resolver_method.compute_clusters({model_step: cc_edges})
    catalog.merge_resolver_clusters_delta(
        resolver_step, assignments, candidate_roots=touched_roots
    )
    return True


def _collect_edges_if_small(edges: DataFrame):
    """Bounded Arrow collect of one batch's scored edges (optimization r13).

    The delta loop used to materialise each batch's edge set up to three
    times — eager checkpoint, edge-delta anti-join, driver-CC probe
    collect. When the edge schema is the canonical ``(left_id long,
    right_id long, score float)`` and the row count fits the SAME driver
    budget the CC escape uses, collect ONCE and hand the driver-resident
    frame to all three consumers (the catalog's edge-delta twin, the star
    union, the CC pandas shortcut) — a LocalRelation needs no checkpoint
    and costs no further jobs. Over-budget or non-canonical edges keep
    the eager-checkpoint shape unchanged. Returns ``(frame, pdf | None)``.
    """
    from matchbox_spark.plans.resolvers import _driver_cc_edge_limit

    spark = edges.sparkSession
    ckpt = edges.localCheckpoint(eager=True)
    fields = ckpt.schema.fields
    if [f.name for f in fields] != ["left_id", "right_id", "score"] or [
        f.dataType.simpleString() for f in fields
    ] != ["bigint", "bigint", "float"]:
        return ckpt, None
    # count over the just-materialised blocks is one cheap job, and the
    # full collect stays a PARALLEL Arrow transfer — a limit(n+1).toPandas
    # probe would funnel through CollectLimitExec's single partition and
    # convert single-threaded (measured ~3x slower at 900k edges)
    if ckpt.count() > _driver_cc_edge_limit(spark):
        return ckpt, None
    pdf = ckpt.toPandas()
    ckpt._mb_local_pdf = pdf
    return ckpt, pdf


def _attach_cc_pdf(cc_edges, epdf, stars):
    """Mark the (new edges ∪ stars) union driver-resident when both parts
    are — the CC pandas shortcut then skips its probe job. The attached
    frame holds exactly the union's rows, so a distributed fallback (over
    the plan) and the shortcut (over the pandas) see the same edge set."""
    if epdf is None:
        return cc_edges
    if stars is None:
        cc_edges._mb_local_pdf = epdf
        return cc_edges
    spdf = getattr(stars, "_mb_local_pdf", None)
    if spdf is None:
        return cc_edges
    import pandas as pd

    cc_edges._mb_local_pdf = (
        pd.concat([epdf, spdf], ignore_index=True) if len(spdf) else epdf
    )
    return cc_edges


def _full_resolve(
    catalog: Catalog,
    model_step: str,
    resolver_step: str,
    data: DataFrame,
    model,
    resolver_method,
    tag: bytes,
) -> None:
    """One full-recompute pass: re-run the model over every accumulated row
    and rebuild the model + resolver steps — O(state), the general-correct
    refresh for models whose scores drift as data accumulates."""
    edges = model.dedupe(data).localCheckpoint(eager=True)
    catalog.drop_step(model_step)
    catalog.insert_model_edges(model_step, edges, fingerprint=tag)
    cc_edges = catalog.model_edges.where(
        F.col("step") == model_step
    ).select("left_id", "right_id", "score")
    assignments = resolver_method.compute_clusters({model_step: cc_edges})
    catalog.steps.pop(resolver_step, None)
    catalog.insert_resolver_clusters(resolver_step, assignments, fingerprint=tag)


def finalize_resolve(
    spark,
    catalog: Catalog,
    source_step: str,
    key_field: str,
    index_fields: list[str],
    model,
    resolver_method,
    source_location: str | None = None,
    serving_matcher=None,
) -> None:
    """Terminal recompute for a cadenced full-mode stream.

    A stream started with ``resolve_cadence=N > 1`` leaves up to N-1
    trailing batches indexed but not resolved. Calling this once after the
    stream drains runs the same full model+resolver rebuild a cadence tick
    runs, so the terminal catalog state is exactly the batch pipeline's —
    one O(state) pass at close instead of one per batch. Refreshes
    ``serving_matcher`` fully when given.
    """
    from matchbox_spark.plans.query import (
        QueryConfig,
        query_data,
        unified_query,
    )
    from matchbox_spark.sources.source import SourceConfig

    model_step = f"{source_step}_model"
    resolver_step = f"{source_step}_resolve"
    cfg = SourceConfig(
        name=source_step,
        location=source_location,
        key_field=key_field,
        index_fields=index_fields,
    )
    data = query_data(spark, catalog, QueryConfig(sources=[cfg]))
    _full_resolve(
        catalog,
        model_step,
        resolver_step,
        data,
        model,
        resolver_method,
        tag=b"finalize",
    )
    if serving_matcher is not None:
        plan = unified_query(
            catalog, [resolver_step], [source_step], level="key"
        )
        serving_matcher.refresh(plan, None)


def incremental_resolve_stream(
    stream: DataFrame,
    catalog: Catalog,
    source_step: str,
    key_field: str,
    index_fields: list[str],
    model,
    resolver_method,
    checkpoint_dir: str,
    source_location: str | None = None,
    blocking_fields: list[str] | None = None,
    serving_matcher=None,
    auto_delta: bool = True,
    resolve_cadence: int = 1,
) -> StreamingQuery:
    """Streaming entity resolution: every micro-batch ingests new rows and
    refreshes the model + resolver state.

    ``source_location`` is the batch-readable path of the stream's data
    (the model re-query joins it against the catalog's ingested keys — the
    inner join means rows from not-yet-processed files drop out, so the
    per-batch model sees exactly the accumulated state).

    Per batch: (1) content-index the batch into ``source_step`` (append-only
    delta insert); (2) derive scored edges; (3) refresh the resolver step so
    queries serve clusters over everything ingested so far — streaming ER
    the reference (batch-only) leaves open.

    **Delta-link mode** (``blocking_fields`` set — names as they appear in
    the queried/qualified space, e.g. ``"s_grp"``; raw batch columns are
    recovered by stripping the ``"{source_step}_"`` prefix, so blocking
    fields must pass through cleaning unchanged): step (2) runs the model
    ONLY over accumulated rows that share a blocking value with the batch —
    everything else is pruned by a broadcast semi-join — and appends the
    resulting edges via the idempotent delta insert. Step (3) runs connected
    components over (new edges ∪ prior star edges), so merges across old
    clusters (a bridging record) still happen, at O(batch blocks + resolved
    entities) per batch instead of O(accumulated corpus). Requires a
    deterministic model whose edges depend only on rows within a block
    (true for blocking-style dedupers/linkers).

    **Full mode**: the model re-runs over ALL indexed data and the
    model/resolver steps are dropped and re-inserted — O(accumulated state)
    per batch by design, the general-correct path for models whose scores
    change as data accumulates (e.g. EM-trained).

    **Computed-blocking delta-link** (a model declaring
    ``delta_block_keys(data) -> (id, block_key)``, e.g. ``MinHashDeduper``
    — an LSH band key is a blocking value computed from the row's own
    content, not a raw field): each batch leaf's keys persist once into the
    catalog's ``block_keys`` index, the batch's keys compute O(batch), and
    one semi-join on ``block_key`` selects the accumulated leaves the model
    could touch. Per-batch model work is O(touched blocks); signatures are
    never recomputed over accumulated state. Correct for models whose edge
    existence requires a shared block key and whose per-row keys depend
    only on that row (true for MinHash/SimHash banding).

    **Auto-routing** (``auto_delta=True``, the default): a model that
    declares block-locality — a ``delta_blocking_fields()`` method
    returning queried-space field names, e.g. ``NaiveDeduper``, or a
    ``delta_block_keys`` method, e.g. ``MinHashDeduper`` — is routed
    through the matching delta path automatically when the caller passes no
    ``blocking_fields``, because for such models delta and full modes
    provably produce the same terminal clusters and only delta-link stays
    flat as state accumulates. Pass ``auto_delta=False`` to force the full
    recompute anyway (e.g. to exercise the general path).

    In delta mode every per-batch state mutation is an O(touched) APPEND:
    ``clusters``/``contains``/``cluster_keys``/``model_edges`` move
    append-only, new resolver claims append, and claims for merged-away
    roots retire via the catalog's tombstone overlay
    (:meth:`~matchbox_spark.plans.catalog.Catalog.merge_resolver_clusters_delta`)
    — nothing is rewritten per batch; tombstones fold in amortised.

    **Cadenced full mode** (``resolve_cadence=N`` with N > 1, full mode
    only): indexing still runs every batch (O(delta)), but the O(state)
    model+resolver recompute runs only on every Nth batch — the cost lever
    for genuinely-global models at scale, trading bounded staleness (up to
    N-1 batches) for an N× cut in amortised recompute. Served clusters
    between recomputes reflect the last resolve; call
    :func:`finalize_resolve` after the stream drains to make the terminal
    state exact. Ignored in delta mode, which is already flat per batch.
    """
    from matchbox_spark.plans.query import (
        QueryConfig,
        query_data,
        unified_query,
    )
    from matchbox_spark.sources.source import SourceConfig

    model_step = f"{source_step}_model"
    resolver_step = f"{source_step}_resolve"

    # corpus-derived ('auto') LSH parameters freeze from the FIRST corpus a
    # model sees — in a stream that is micro-batch 1, the one slice that is
    # NO proxy for the eventual corpus (a 1k-doc first batch would freeze
    # 16-bit SimHash, the width measured quadratic by ~50k docs). The
    # delta path already refuses this inside delta_block_keys; the full-
    # recompute path would silently mis-size, so refuse EVERY route up
    # front with the same pinning guidance.
    unresolved = [
        name
        for name in ("bits", "bucket_dims")
        if getattr(getattr(model, "settings", None), name, None) == AUTO
    ]
    if unresolved:
        raise ValueError(
            f"{type(model).__name__}({', '.join(unresolved)}='auto') sizes "
            "its parameters from the full corpus at dedupe() time, but a "
            "stream's first micro-batch is no proxy for the corpus — pin "
            "explicitly for incremental_resolve_stream (size with "
            "auto_simhash_bits / auto_embedding_bucket_dims against the "
            "expected corpus)"
        )

    use_block_keys = False
    if blocking_fields is None and auto_delta:
        probe = getattr(model, "delta_blocking_fields", None)
        if callable(probe):
            blocking_fields = probe()
        elif callable(getattr(model, "delta_block_keys", None)):
            # computed-blocking contract (LSH-family): the model can state,
            # per row, the block keys under which it can ever form an edge
            use_block_keys = True

    if resolve_cadence < 1:
        raise ValueError("resolve_cadence must be >= 1")

    # r14 delta-pair map path: a field-blocked model declaring the
    # pairwise contract (edges = all distinct-id pairs within equal
    # non-null unique-field tuples, fixed score) streams through a driver
    # block map — each batch emits only its old×new ∪ new×new pairs and
    # never rebuilds the O(accumulated) blocked superset. Gated on: the
    # contract fields being part of the hashed index content (so their
    # per-hash values ride the index collect) and their types having
    # stable driver-side equality under a string cast (floats excluded:
    # Spark's groupBy normalises NaN and -0.0, the cast does not).
    dcontract = None
    dmap = {"live": None, "blocks": {}, "rows": 0}
    if blocking_fields and not use_block_keys:
        _pw = getattr(model, "delta_pairwise_contract", None)
        _c = _pw() if callable(_pw) else None
        if _c:
            _prefix = f"{source_step}_"
            _raw = [
                f[len(_prefix):] if f.startswith(_prefix) else f
                for f in _c["fields"]
            ]
            _dt = dict(stream.dtypes)
            _ok = {"tinyint", "smallint", "int", "bigint", "string",
                   "boolean", "date"}
            if (
                _raw
                and set(_raw) <= set(index_fields)
                and all(
                    f in _dt
                    and (_dt[f] in _ok or _dt[f].startswith("decimal"))
                    for f in _raw
                )
            ):
                dcontract = {
                    "raw": _raw,
                    "score": float(_c["score"]),
                    "cap": _c["max_group_size"],
                }

    run = {"from_start": False}  # did THIS run witness batch 0?

    def _refresh_serving(batch: DataFrame) -> None:
        if serving_matcher is None:
            return
        # keep the interactive lookup warm: patch the matcher's cached
        # projection with just this batch's changed clusters (delta
        # mode — merges only enter through batch rows) or fully
        # re-materialise (full mode — any score may have drifted)
        plan = unified_query(
            catalog, [resolver_step], [source_step], level="key"
        )
        touched = (
            batch.select(
                F.lit(source_step).alias("source"),
                F.col(key_field).cast("string").alias("key"),
            ).distinct()
            if (blocking_fields or use_block_keys)
            else None
        )
        serving_matcher.refresh(plan, touched)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch_id == 0:
            run["from_start"] = True
        if batch.isEmpty():
            return
        if not run["from_start"]:
            _guard_checkpoint_state(catalog, source_step, batch_id)
        # freeing the batch-local checkpoints below assumes every catalog
        # delta eagerly checkpointed its OWN copy; if any _ckpt fell back
        # to the raw plan (rare AQE planning bug), a stored part still
        # references these frames — freeing them would truncate lineage
        # unrecoverably, so on fallback we skip the frees for this batch
        # (pre-r10 behaviour: blocks linger until a driver GC)
        fallbacks0 = catalog._ckpt_fallbacks
        bidx = None
        if dcontract is not None and dmap["live"] is not False:
            if dmap["live"] is None:
                # the map is complete only if this run witnessed batch 0
                # against a catalog holding no prior state for any of the
                # stream's steps (pre-stream rows would be invisible to it)
                dmap["live"] = run["from_start"] and not any(
                    s in catalog.steps
                    for s in (source_step, model_step, resolver_step)
                )
            if dmap["live"]:
                bidx = _index_batch(
                    catalog,
                    source_step,
                    batch,
                    key_field,
                    index_fields,
                    value_fields=dcontract["raw"],
                )
                if bidx is None:
                    # index twin dead (mirror invalidated / over-budget):
                    # the map misses this batch's members — retire it
                    dmap["live"] = False
        if bidx is None:
            _index_batch(catalog, source_step, batch, key_field, index_fields)

        if (
            not blocking_fields
            and not use_block_keys
            and resolve_cadence > 1
            and batch_id % resolve_cadence != 0
        ):
            # cadenced full mode: index-only batch — the O(state) recompute
            # waits for the next cadence tick (or finalize_resolve); the
            # serving matcher keeps the last resolve's projection
            return

        if bidx is not None:
            if _delta_pair_batch(
                catalog,
                model_step,
                resolver_step,
                resolver_method,
                bidx,
                dcontract,
                dmap,
                batch.sparkSession,
            ):
                _refresh_serving(batch)
                return
            # batch blew the driver budget BEFORE any map mutation: the
            # blocked-superset branch below handles it distributed, and
            # the (now incomplete-going-forward) map retires for the run
            dmap["live"] = False

        cfg = SourceConfig(
            name=source_step,
            location=source_location,
            key_field=key_field,
            index_fields=index_fields,
        )
        data = query_data(
            batch.sparkSession, catalog, QueryConfig(sources=[cfg])
        )

        if blocking_fields:
            # OR semantics: keep accumulated rows sharing ANY blocking value
            # with the batch — a conservative superset that is correct for
            # both tuple-blocked and multi-pass (per-field) models
            prefix = f"{source_step}_"
            raw = [
                f[len(prefix):] if f.startswith(prefix) else f
                for f in blocking_fields
            ]
            # one collect_set job + an OR-of-isin filter (optimization r13)
            # instead of per-field distinct + broadcast-semi-join + union +
            # dropDuplicates — the same batch blocking values the old path
            # broadcast now drive a plain filter, so the superset
            # checkpoint below is one scan+join+filter with no union/dedup
            # exchange and no per-field job. Row-identical: OR of
            # memberships == the deduplicated union of per-field
            # semi-joins, and isin's null-in-data handling (NULL → filter
            # drops) matches the semi-join's null-key behaviour. A batch
            # whose distinct value set is too large for an expression
            # literal falls back to the semi-join shape — the value set is
            # exactly what the old path collected into its broadcasts.
            sets = batch.agg(
                *[F.collect_set(r).alias(q) for q, r in zip(blocking_fields, raw)]
            ).collect()[0]
            vals_by_field = {q: sets[q] for q in blocking_fields}
            if sum(len(v) for v in vals_by_field.values()) <= 100_000:
                cond = None
                for q in blocking_fields:
                    vals = vals_by_field[q]
                    if not vals:
                        continue
                    c = F.col(q).isin(list(vals))
                    cond = c if cond is None else (cond | c)
                data = data.where(cond if cond is not None else F.lit(False))
            else:
                touched_parts = []
                for q, r in zip(blocking_fields, raw):
                    vals = batch.select(F.col(r).alias(q)).distinct()
                    touched_parts.append(
                        data.join(F.broadcast(vals), q, "left_semi")
                    )
                data = touched_parts[0]
                for part in touched_parts[1:]:
                    data = data.unionByName(part)
                if len(touched_parts) > 1:
                    data = data.dropDuplicates()
            # materialise the superset ONCE: both the model and the
            # batch_leaves set below consume it, and without the pin each
            # would re-run the query_data join + per-field semi-joins over
            # the accumulated index (the dominant per-batch scan)
            data = data.localCheckpoint(eager=True)
            new_edges, epdf = _collect_edges_if_small(model.dedupe(data))
            catalog.insert_model_edges_delta(model_step, new_edges)
            _batch_locals = [data, new_edges]
            # only components holding a leaf the model could touch this
            # batch are starred, recomputed, and (if merged away) retired —
            # per-batch resolver work is O(batch blocks + touched members),
            # not O(all resolved entities)
            batch_leaves = data.select(F.col("id").alias("leaf_id")).distinct()
            stars, touched_roots = _touched_star_edges(
                catalog, resolver_step, batch_leaves
            )
            cc_edges = _attach_cc_pdf(
                new_edges if stars is None else new_edges.unionByName(stars),
                epdf,
                stars,
            )
            assignments = resolver_method.compute_clusters(
                {model_step: cc_edges}
            )
            catalog.merge_resolver_clusters_delta(
                resolver_step, assignments, candidate_roots=touched_roots
            )
            # free batch-local checkpoints (see the use_block_keys branch)
            if catalog._ckpt_fallbacks == fallbacks0:
                for frame in _batch_locals + [touched_roots]:
                    if frame is not None:
                        _free_checkpoint(frame)
            else:
                # a checkpoint fell back to AQE-cached plans mid-batch:
                # freeing now could drop blocks a fallback plan still
                # references, so the frees are deferred to driver GC — say
                # so, or a long-running stream's lingering blocks look like
                # the pre-r10 leak instead of this deliberate skip
                logger.warning(
                    "batch %s: skipped freeing %d batch-local checkpoints "
                    "(catalog checkpoint fallbacks %d -> %d); blocks are "
                    "released by driver GC",
                    batch_id,
                    sum(
                        f is not None
                        for f in _batch_locals + [touched_roots]
                    ),
                    fallbacks0,
                    catalog._ckpt_fallbacks,
                )
        elif use_block_keys:
            # computed-blocking delta-link (LSH-family models): the batch's
            # block keys — O(batch) to compute, a pure function of batch
            # content, so replay-safe — select the accumulated leaves the
            # model could touch via one semi-join on the persisted key index
            id_col = getattr(
                getattr(model, "settings", None), "id", None
            ) or "id"
            batch_hashes = batch.select(
                row_hash_expr(batch.schema, sorted(index_fields)).alias(
                    "cluster_hash"
                )
            ).distinct()
            batch_leaf_ids = (
                catalog.clusters.join(batch_hashes, "cluster_hash", "left_semi")
                .select(F.col("cluster_id").alias(id_col))
                .localCheckpoint(eager=True)
            )
            batch_rows = data.join(
                batch_leaf_ids, id_col, "left_semi"
            ).localCheckpoint(eager=True)
            batch_keys = model.delta_block_keys(batch_rows).localCheckpoint(
                eager=True
            )
            # persist the batch leaves' keys FIRST (insert-if-absent per
            # leaf), so the touched semi-join below sees the batch itself
            catalog.insert_block_keys_delta(
                model_step,
                batch_keys.select(
                    F.col(id_col).alias("leaf_id"), "block_key"
                ),
            )
            touched_leaves = (
                catalog.block_keys.where(F.col("step") == model_step)
                .join(
                    batch_keys.select("block_key").distinct(),
                    "block_key",
                    "left_semi",
                )
                .select("leaf_id")
                .distinct()
                .localCheckpoint(eager=True)
            )
            data = data.join(
                touched_leaves.select(F.col("leaf_id").alias(id_col)),
                id_col,
                "left_semi",
            ).localCheckpoint(eager=True)
            new_edges, epdf = _collect_edges_if_small(model.dedupe(data))
            catalog.insert_model_edges_delta(model_step, new_edges)
            stars, touched_roots = _touched_star_edges(
                catalog, resolver_step, touched_leaves
            )
            cc_edges = _attach_cc_pdf(
                new_edges if stars is None else new_edges.unionByName(stars),
                epdf,
                stars,
            )
            assignments = resolver_method.compute_clusters(
                {model_step: cc_edges}
            )
            catalog.merge_resolver_clusters_delta(
                resolver_step, assignments, candidate_roots=touched_roots
            )
            # batch-local checkpoints are dead once the batch's catalog
            # deltas are materialised (the catalog eagerly checkpoints its
            # own copies); free them now — otherwise every micro-batch
            # leaves one set of cached blocks behind until a driver GC
            # happens to run (round 10, same lifecycle fix as CC rounds)
            _locals = (
                batch_leaf_ids,
                batch_rows,
                batch_keys,
                touched_leaves,
                data,
                new_edges,
                touched_roots,
            )
            if catalog._ckpt_fallbacks == fallbacks0:
                for frame in _locals:
                    if frame is not None:
                        _free_checkpoint(frame)
            else:
                logger.warning(
                    "batch %s: skipped freeing %d batch-local checkpoints "
                    "(catalog checkpoint fallbacks %d -> %d); blocks are "
                    "released by driver GC",
                    batch_id,
                    sum(f is not None for f in _locals),
                    fallbacks0,
                    catalog._ckpt_fallbacks,
                )
        else:
            _full_resolve(
                catalog,
                model_step,
                resolver_step,
                data,
                model,
                resolver_method,
                tag=f"b{batch_id}".encode(),
            )

        _refresh_serving(batch)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
