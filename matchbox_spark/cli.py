"""Command-line interface over the collection / run / query / eval surface.

Mirrors the reference's typer CLI verbs (client/cli/main.py:1-54 ``version``;
collections.py:1-137 ``collections list/create/delete``; the eval command's
annotation loop, cli/eval + annotations.py:1-68) on top of this engine's
existing logic — :class:`~matchbox_spark.plans.collections.CollectionStore`
for namespace/run lifecycle, :func:`~matchbox_spark.plans.query.unified_query`
via ``Collection.query`` for retrieval, :func:`match_key` for lookups, and
:class:`~matchbox_spark.eval_session.EvalSession` for judging. Auth/groups/
permissions verbs are out of scope with the rest of the HTTP surface (SURVEY
§1.4). argparse, not typer — the environment ships no third-party CLI deps.

Usage (installed module form)::

    python -m matchbox_spark.cli --store ./store collections create mycoll
    python -m matchbox_spark.cli --store ./store runs create mycoll
    python -m matchbox_spark.cli --store ./store runs publish mycoll 1
    python -m matchbox_spark.cli --store ./store query mycoll \
        --sources cust --resolvers resolve --limit 10
    python -m matchbox_spark.cli --store ./store lookup mycoll \
        --key 42 --source cust --targets supp --resolvers resolve
    python -m matchbox_spark.cli --store ./store annotate mycoll \
        --resolver resolve --sources cust --user alice

The store is a directory of collections (``<store>/<collection>/run_<n>``,
each run a catalog snapshot tree); ``--store`` defaults to
``$MATCHBOX_SPARK_STORE`` then ``./matchbox_store``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from dataclasses import dataclass


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="matchbox-spark",
        description="PySpark-native entity resolution: collections, runs, "
        "queries, lookups, and evaluation.",
    )
    p.add_argument(
        "--store",
        default=os.environ.get("MATCHBOX_SPARK_STORE", "./matchbox_store"),
        help="collection store directory (default: $MATCHBOX_SPARK_STORE "
        "or ./matchbox_store)",
    )
    p.add_argument(
        "--master",
        default=None,
        help="Spark master URL (default: local[$SPARK_GRAFT_CPUS] or "
        "local[*])",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("version", help="show the engine version")

    coll = sub.add_parser("collections", help="manage collections")
    csub = coll.add_subparsers(dest="subcommand", required=True)
    csub.add_parser("list", help="list collections in the store")
    c_create = csub.add_parser("create", help="create a collection")
    c_create.add_argument("name")
    c_del = csub.add_parser("delete", help="delete a collection")
    c_del.add_argument("name")
    c_del.add_argument(
        "--certain",
        action="store_true",
        help="confirm deletion of a collection that still holds runs",
    )

    runs = sub.add_parser("runs", help="manage runs inside a collection")
    rsub = runs.add_subparsers(dest="subcommand", required=True)
    r_list = rsub.add_parser("list", help="list a collection's runs")
    r_list.add_argument("collection")
    r_create = rsub.add_parser("create", help="create a mutable run")
    r_create.add_argument("collection")
    r_pub = rsub.add_parser(
        "publish", help="freeze a run and make it the default"
    )
    r_pub.add_argument("collection")
    r_pub.add_argument("run_id", type=int)
    r_del = rsub.add_parser("delete", help="delete a run")
    r_del.add_argument("collection")
    r_del.add_argument("run_id", type=int)
    r_del.add_argument(
        "--certain",
        action="store_true",
        help="confirm deletion of a run that still holds steps",
    )

    q = sub.add_parser(
        "query", help="project source keys to resolved entity ids"
    )
    q.add_argument("collection")
    q.add_argument("--sources", nargs="+", required=True)
    q.add_argument(
        "--resolvers",
        nargs="+",
        required=True,
        help="resolver lineage in priority order (highest first)",
    )
    q.add_argument("--run", type=int, default=None, help="run id (default: "
                   "the collection's published default run)")
    q.add_argument("--level", choices=["key", "leaf"], default="key")
    q.add_argument("--limit", type=int, default=20, help="rows to print")
    q.add_argument(
        "--output", default=None, help="write full result to this parquet "
        "path instead of printing"
    )

    lk = sub.add_parser(
        "lookup", help="which keys in each target share a key's entity?"
    )
    lk.add_argument("collection")
    lk.add_argument("--key", required=True)
    lk.add_argument("--source", required=True)
    lk.add_argument("--targets", nargs="+", required=True)
    lk.add_argument("--resolvers", nargs="+", required=True)
    lk.add_argument("--run", type=int, default=None)

    an = sub.add_parser(
        "annotate", help="interactive judging loop over sampled clusters"
    )
    an.add_argument("collection")
    an.add_argument("--resolver", required=True)
    an.add_argument(
        "--resolvers",
        nargs="+",
        default=None,
        help="full lineage in priority order (default: just --resolver)",
    )
    an.add_argument("--sources", nargs="+", required=True)
    an.add_argument("--run", type=int, default=None)
    an.add_argument("--user", default="default")
    an.add_argument("--n", type=int, default=100, help="clusters to sample")
    an.add_argument(
        "--output",
        default=None,
        help="write judgements to this parquet path on quit",
    )
    return p


@dataclass
class _LineageShim:
    """Adapts a loaded run to the DAG surface EvalSession expects: the
    catalog plus an explicit resolver lineage (a loaded catalog stores step
    outputs, not the step graph, so lineage arrives from the caller)."""

    spark: object
    catalog: object
    _lineage: dict

    def resolver_lineage(self, resolver: str) -> list[str]:
        return self._lineage[resolver]


def _get_spark(args):
    from matchbox_spark.session import get_spark

    return get_spark(app_name="matchbox_spark_cli", master=args.master)


def _store(args, spark):
    from matchbox_spark.plans.collections import CollectionStore

    os.makedirs(args.store, exist_ok=True)
    return CollectionStore(spark, path=args.store)


def _run_of(store, args):
    coll = store.get_collection(args.collection)
    return coll, coll._resolve(getattr(args, "run", None))


def cmd_version(args, out) -> int:
    import matchbox_spark

    print(f"matchbox_spark version: {matchbox_spark.__version__}", file=out)
    return 0


def cmd_collections(args, out) -> int:
    spark = _get_spark(args)
    store = _store(args, spark)
    if args.subcommand == "list":
        for name in store.list_collections():
            print(name, file=out)
        return 0
    if args.subcommand == "create":
        store.create_collection(args.name)
        store.get_collection(args.name).save()
        print(f"created collection {args.name}", file=out)
        return 0
    if args.subcommand == "delete":
        from matchbox_spark.plans.collections import DeletionNotConfirmedError

        try:
            store.delete_collection(args.name, certain=args.certain)
        except DeletionNotConfirmedError as e:
            print(
                f"collection {args.name} still holds {e.children}; "
                "pass --certain to delete",
                file=sys.stderr,
            )
            return 1
        cpath = os.path.join(args.store, args.name)
        if os.path.isdir(cpath):
            shutil.rmtree(cpath)
        print(f"deleted collection {args.name}", file=out)
        return 0
    raise AssertionError(args.subcommand)


def cmd_runs(args, out) -> int:
    spark = _get_spark(args)
    store = _store(args, spark)
    coll = store.get_collection(args.collection)
    if args.subcommand == "list":
        for rid in sorted(coll.runs):
            run = coll.runs[rid]
            flags = []
            if run.is_default:
                flags.append("default")
            flags.append("mutable" if run.is_mutable else "immutable")
            steps = sorted(run._catalog.steps)
            print(
                f"run {rid} [{', '.join(flags)}] steps: "
                f"{', '.join(steps) or '(none)'}",
                file=out,
            )
        return 0
    if args.subcommand == "create":
        run = coll.create_run()
        coll.save()
        print(f"created run {run.run_id} in {coll.name}", file=out)
        return 0
    if args.subcommand == "publish":
        run = coll.publish_run(args.run_id)
        coll.save()
        print(
            f"published run {run.run_id} as the default of {coll.name}",
            file=out,
        )
        return 0
    if args.subcommand == "delete":
        from matchbox_spark.plans.collections import DeletionNotConfirmedError

        try:
            coll.delete_run(args.run_id, certain=args.certain)
        except DeletionNotConfirmedError as e:
            print(
                f"run {args.run_id} still holds steps {e.children}; "
                "pass --certain to delete",
                file=sys.stderr,
            )
            return 1
        rpath = coll._run_path(args.run_id)
        if rpath and os.path.isdir(rpath):
            shutil.rmtree(rpath)
        coll.save()
        print(f"deleted run {args.run_id} from {coll.name}", file=out)
        return 0
    raise AssertionError(args.subcommand)


def cmd_query(args, out) -> int:
    spark = _get_spark(args)
    store = _store(args, spark)
    coll = store.get_collection(args.collection)
    df = coll.query(
        args.resolvers, args.sources, run_id=args.run, level=args.level
    )
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}", file=out)
        return 0
    rows = df.limit(args.limit).collect()
    cols = df.columns
    print("\t".join(cols), file=out)
    for r in rows:
        print("\t".join(str(r[c]) for c in cols), file=out)
    return 0


def cmd_lookup(args, out) -> int:
    spark = _get_spark(args)
    store = _store(args, spark)
    coll = store.get_collection(args.collection)
    matches = coll.match_key(
        key=args.key,
        source=args.source,
        targets=args.targets,
        resolvers=args.resolvers,
        run_id=args.run,
    )
    for m in matches:
        keys = ", ".join(sorted(m.target_keys)) or "(no match)"
        print(f"{m.target}: {keys}", file=out)
    return 0


def cmd_annotate(args, out, stdin=None) -> int:
    """The reference eval loop (cli/eval): show each sampled cluster's
    members, accept a grouping (``1 2 | 3`` splits leaves into entities,
    ``s`` skips, ``q`` quits), record judgements."""
    from matchbox_spark.eval_session import EvalSession

    stdin = stdin or sys.stdin
    spark = _get_spark(args)
    store = _store(args, spark)
    coll, run = _run_of(store, args)
    lineage = args.resolvers or [args.resolver]
    shim = _LineageShim(
        spark=spark,
        catalog=run._catalog,
        _lineage={args.resolver: lineage},
    )
    session = EvalSession(
        shim, args.resolver, args.sources, user=args.user, n=args.n
    )
    print(f"{session.total_count()} clusters queued", file=out)
    while True:
        item = session.current()
        if item is None:
            print("queue empty", file=out)
            break
        print(f"\ncluster {item.root}:", file=out)
        for i, m in enumerate(item.members, 1):
            print(
                f"  [{i}] leaf={m['leaf']} {m['source']}:{m['key']}",
                file=out,
            )
        print(
            "groups (e.g. '1 2 | 3'), Enter = endorse as shown, "
            "s = skip, q = quit: ",
            file=out,
        )
        line = stdin.readline()
        if not line:
            break
        line = line.strip()
        if line == "q":
            break
        if line == "s":
            session.skip()
            continue
        leaves = item.leaves
        if not line:
            groups = [leaves]
        else:
            try:
                groups = [
                    [
                        item.members[int(tok) - 1]["leaf"]
                        for tok in part.split()
                    ]
                    for part in line.split("|")
                ]
            except (ValueError, IndexError):
                print("unparseable grouping, try again", file=out)
                continue
        try:
            session.submit(groups)
        except ValueError as e:
            print(f"rejected: {e}", file=out)
    n_j = session.judgements().count()
    print(f"\n{n_j} judgements recorded", file=out)
    if args.output and n_j:
        session.judgements().write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}", file=out)
    return 0


def main(argv: list[str] | None = None, out=None, stdin=None) -> int:
    out = out or sys.stdout
    args = _build_parser().parse_args(argv)
    if args.command == "version":
        return cmd_version(args, out)
    if args.command == "collections":
        return cmd_collections(args, out)
    if args.command == "runs":
        return cmd_runs(args, out)
    if args.command == "query":
        return cmd_query(args, out)
    if args.command == "lookup":
        return cmd_lookup(args, out)
    if args.command == "annotate":
        return cmd_annotate(args, out, stdin=stdin)
    raise AssertionError(args.command)


if __name__ == "__main__":
    sys.exit(main())
