#!/usr/bin/env python
"""Command-line entry point — reference parity with ``riot-graph.py``
(``riot-graph.py:41-106``): ``fetch`` for one-shot/backfill ingestion,
``server`` for the HTTP ``/update`` micro-service, the same logging levels
(``--cron`` mutes to warnings, ``--debug`` opens up), and ``--noop`` dry
runs. argparse instead of docopt (stdlib-only container).

Usage:
  python cli.py fetch [--cron|--debug] [--history N | --days N] [--noop] CONFIG
  python cli.py server [--quiet|--debug] [--host H] [--port P] CONFIG

The engine work lives in the package (plans/fetch.py, streaming/ingest.py);
this file only parses argv, loads the INI config, and dispatches.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="cli.py", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    f = sub.add_parser("fetch", help="one-time fetch / backfill")
    f.add_argument("config")
    g = f.add_mutually_exclusive_group()
    g.add_argument("--days", "-d", type=int, default=None,
                   help="retrieve day N in the past (default: 0, today)")
    g.add_argument("--history", "-H", type=int, default=None,
                   help="backfill the last N days in ONE query")
    f.add_argument("--noop", "-n", action="store_true",
                   help="run the plan, write nothing")
    lg = f.add_mutually_exclusive_group()
    lg.add_argument("--cron", "-C", action="store_true")
    lg.add_argument("--debug", "-D", action="store_true")

    s = sub.add_parser("server", help="HTTP /update micro-service")
    s.add_argument("config")
    s.add_argument("--host", default="::1")
    s.add_argument("--port", type=int, default=8080)
    lg = s.add_mutually_exclusive_group()
    lg.add_argument("--quiet", action="store_true")
    lg.add_argument("--debug", "-D", action="store_true")

    c = sub.add_parser(
        "curate",
        help="select the high-quality deduplicated training corpus from a "
        "documents table and write it sharded for the data loader",
    )
    c.add_argument("--tables", "-t", required=True,
                   help="directory containing documents.parquet")
    c.add_argument("--out", "-o", required=True, help="output parquet dir")
    c.add_argument("--lang", default="en")
    c.add_argument("--min-quality", type=float, default=0.5)
    c.add_argument("--shards", type=int, default=8)

    q = sub.add_parser(
        "query",
        help="run an InfluxQL (dashboard subset) or Spark SQL query over a "
        "directory of parquet tables; JSON lines to stdout",
    )
    q.add_argument("sql")
    q.add_argument("--tables", "-t", required=True,
                   help="directory of parquet tables to register as views")
    q.add_argument("--limit", type=int, default=1000,
                   help="max rows printed (default 1000)")
    return ap


def _run_query(args) -> int:
    """InfluxQL first (the dashboard surface), Spark SQL as the fallback —
    one command covers both query languages the engine speaks."""
    import json as _json

    from riot_graphs_spark.functions.influxql import (
        InfluxQLError,
        influxql,
        parse_influxql,
        parse_show,
    )
    from riot_graphs_spark.session import get_spark
    from riot_graphs_spark.sources.tables import register_tables

    spark = get_spark(app_name="riot-graphs-query")
    register_tables(spark, args.tables)
    # Fall back to Spark SQL only when the statement isn't recognizable
    # InfluxQL at all; a query that PARSES as InfluxQL but fails to
    # translate (e.g. $timeFilter without time_range) keeps its helpful
    # shim error instead of an unrelated SQL parse error.
    is_influx = True
    if parse_show(args.sql) is None:
        try:
            parse_influxql(args.sql)
        except InfluxQLError:
            is_influx = False
    df = influxql(spark, args.sql) if is_influx else spark.sql(args.sql)
    for row in df.limit(args.limit).collect():
        print(_json.dumps(row.asDict(recursive=True), default=str))
    return 0


def _run_curate(args) -> int:
    """Batch curation export: quality/lang/dedup selection
    (plans.corpus.select_training_corpus) joined back to text, shard-
    shuffled (curation.shard_corpus) and written partitioned by shard —
    the directory layout a training data loader streams."""
    import json as _json

    from riot_graphs_spark.operators.curation import shard_corpus
    from riot_graphs_spark.plans.corpus import select_training_corpus
    from riot_graphs_spark.session import get_spark
    from riot_graphs_spark.sources.tables import load_table

    spark = get_spark(app_name="riot-graphs-curate")
    docs = load_table(spark, args.tables, "documents")
    selected = select_training_corpus(
        docs, lang=args.lang, min_quality=args.min_quality
    )
    corpus = selected.join(docs.select("doc_id", "source", "text"), "doc_id")
    sharded = shard_corpus(corpus, n_shards=args.shards)
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(args.out)
    )
    kept = spark.read.parquet(args.out).count()
    print(_json.dumps({"docs_in": docs.count(), "docs_kept": kept,
                       "shards": args.shards, "out": args.out}))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    level = logging.INFO
    if getattr(args, "cron", False) or getattr(args, "quiet", False):
        level = logging.WARNING
    elif getattr(args, "debug", False):
        level = logging.DEBUG
    logging.basicConfig(level=level)

    if args.command == "query":
        return _run_query(args)
    if args.command == "curate":
        return _run_curate(args)

    from riot_graphs_spark.config import ConfigError, load_config

    try:
        conf = load_config(args.config)
    except ConfigError as e:
        raise SystemExit(str(e))  # reference exits on bad config (rg.py:413)

    from riot_graphs_spark.session import get_spark

    spark = get_spark(
        app_name=f"riot-graphs-{args.command}",
        **(
            {"shuffle_partitions": conf.shuffle_partitions}
            if conf.shuffle_partitions
            else {}
        ),
    )

    if args.command == "fetch":
        from riot_graphs_spark.plans.fetch import batch_fetch

        if args.history is not None:
            logging.info("Backfilling %d days in one query", args.history)
        else:
            logging.info("Fetching day %d in the past", args.days or 0)
        n = batch_fetch(
            spark,
            conf.landing_dir,
            conf.sink_path,
            days=args.days or 0,
            history=args.history,
            noop=args.noop,
        )
        logging.info("Ingested %d new rows%s", n, " (noop)" if args.noop else "")
        print(n)
        return 0

    # server
    from riot_graphs_spark.streaming.ingest import incremental_refresh
    from server import make_handler
    from http.server import ThreadingHTTPServer

    def refresh() -> int:
        return incremental_refresh(
            spark, conf.landing_dir, conf.sink_path, conf.checkpoint_dir
        )

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(refresh))
    logging.info("Serving /update on %s:%d", args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
