"""CLI surface — the reference's command-line entry points, Spark-backed.

Mirrors the reference's user-facing commands (cli.py:376-462, vdb
subcommands cli.py:114-133): retrieval, dump/export, bulk index build,
mapreduce, dedup sweeps — so a user of the reference can run the same
jobs against the Spark engine. Results print as JSON lines (machine-
consumable, like `vdb dump`).

Usage:
    python -m debgpt7_8_with_vectordb_spark retrieve --sf-dir D --query-id 0 -k 3
    python -m debgpt7_8_with_vectordb_spark dump --sf-dir D [--limit N] [--out x.jsonl]
    python -m debgpt7_8_with_vectordb_spark index --sf-dir D --out /path [--dim 64]
    python -m debgpt7_8_with_vectordb_spark mapreduce --sf-dir D [--compact]
    python -m debgpt7_8_with_vectordb_spark dedup --sf-dir D --method exact|minhash|simhash
    python -m debgpt7_8_with_vectordb_spark query --sf-dir D --name <catalog-query>
    python -m debgpt7_8_with_vectordb_spark compact --path /corpus [--target-mb 128]
    python -m debgpt7_8_with_vectordb_spark curate --warc /crawl/*.warc \
        [--robots robots.parquet] [--quality] [--to-documents --out /corpus]
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(args: argparse.Namespace) -> SparkSession:
    """getOrCreate + remember ownership: when an ambient session exists
    (tests, notebooks), reuse it and DON'T stop it on exit."""
    from .session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"cli-{args.cmd}", shuffle_partitions=args.partitions)
    spark._cli_owns_session = not preexisting  # type: ignore[attr-defined]
    return spark


def _maybe_stop(spark: SparkSession) -> None:
    if getattr(spark, "_cli_owns_session", True):
        spark.stop()


def _emit(df, limit: int | None, out: str | None) -> None:
    """Print (or write) rows as JSON lines — S6 dump format."""
    if out:
        (df.limit(limit) if limit else df).write.mode("overwrite").json(out)
        print(json.dumps({"written": out}))
        return
    for row in (df.limit(limit) if limit else df).toJSON().collect():
        print(row)


def cmd_retrieve(args) -> int:
    spark = _spark(args)
    from .operators.retrieval import (
        get_query_vector,
        resolve_provenance,
        score_against_query,
        topk,
    )
    from .tables import load_table

    emb = load_table(spark, args.sf_dir, "embeddings")
    docs = load_table(spark, args.sf_dir, "documents")
    qv = get_query_vector(emb, args.query_id)
    winners = topk(score_against_query(emb, qv), k=args.k)
    out = resolve_provenance(winners, docs, "vec_id", "doc_id").select(
        "vec_id", "score", "source", "lang"
    )
    _emit(out, None, args.out)
    _maybe_stop(spark)
    return 0


def cmd_dump(args) -> int:
    spark = _spark(args)
    from .plans import QUERIES

    _emit(QUERIES["vdb_dump"](spark, args.sf_dir), args.limit, args.out)
    _maybe_stop(spark)
    return 0


def cmd_index(args) -> int:
    spark = _spark(args)
    from .operators.embedding import bulk_index_build
    from .tables import load_table

    docs = load_table(spark, args.sf_dir, "documents")
    bulk_index_build(docs, args.out, dim=args.dim)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"indexed": n, "out": args.out, "dim": args.dim}))
    _maybe_stop(spark)
    return 0


def cmd_mapreduce(args) -> int:
    spark = _spark(args)
    from .plans import QUERIES

    name = "mapreduce_echo_compact" if args.compact else "mapreduce_echo"
    _emit(QUERIES[name](spark, args.sf_dir), None, args.out)
    _maybe_stop(spark)
    return 0


def cmd_dedup(args) -> int:
    spark = _spark(args)
    from .plans import QUERIES

    name = {
        "exact": "dedup_exact",
        "minhash": "dedup_minhash_verified",
        "simhash": "dedup_simhash",
        "ngram": "dedup_ngram_jaccard",
        "embedding": "embedding_neardup",
        "clusters": "dedup_clusters",
        "semantic": "dedup_embedding_clusters",
        "keep": "dedup_lsh_keep",
        "decontaminate": "contamination_filter",
        "mixture": "corpus_mixture",
    }[args.method]
    _emit(QUERIES[name](spark, args.sf_dir), args.limit, args.out)
    _maybe_stop(spark)
    return 0


def cmd_query(args) -> int:
    """Run any catalog query by name (the full reference-parity surface)."""
    spark = _spark(args)
    from .plans import QUERIES

    if args.name not in QUERIES:
        print(
            json.dumps({"error": f"unknown query {args.name!r}", "available": sorted(QUERIES)}),
            file=sys.stderr,
        )
        _maybe_stop(spark)
        return 2
    _emit(QUERIES[args.name](spark, args.sf_dir), args.limit, args.out)
    _maybe_stop(spark)
    return 0


def cmd_compact(args) -> int:
    """Small-shard compaction of a written corpus (sinks.compact_corpus)
    — the maintenance pass a long-lived corpus needs; prints the
    refreshed manifest summary."""
    spark = _spark(args)
    from .sinks import compact_corpus

    man = compact_corpus(spark, args.path, target_bytes=args.target_mb << 20)
    print(
        json.dumps(
            {
                "path": args.path,
                "compacted": man["compacted"],
                "n_shards": man["n_shards"],
                "n_rows": man["n_rows"],
            }
        )
    )
    _maybe_stop(spark)
    return 0


def cmd_curate(args) -> int:
    """WARC shards -> curated training documents: the full crawl head
    (robots -> canonical-URL dedup -> boilerplate -> optional published
    quality gates -> content dedup) as one CLI job. ``--to-documents``
    writes the engine's documents-table shape (parquet) so every
    downstream corpus operator applies; otherwise curated rows emit as
    JSONL. ``--robots`` takes a parquet/JSON table of
    (host, robots_txt)."""
    spark = _spark(args)
    from .operators.crawl import crawl_report, crawl_to_documents, curate_crawl
    from .sources.readers import read_warc

    warc = read_warc(spark, args.warc)
    robots = None
    if args.robots:
        reader = spark.read
        robots = (
            reader.parquet(args.robots)
            if args.robots.endswith(".parquet")
            else reader.json(args.robots)
        )
    curated = curate_crawl(
        warc,
        robots,
        agent=args.agent,
        min_text_chars=args.min_chars,
        quality=args.quality,
    )
    if args.report:
        for row in crawl_report(curated).toJSON().collect():
            print(row)
    if args.to_documents:
        if not args.out:
            print(json.dumps({"error": "--to-documents requires --out"}))
            _maybe_stop(spark)
            return 2
        crawl_to_documents(curated).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out, "format": "documents"}))
    elif not args.report:
        _emit(curated.drop("html"), args.limit, args.out)
    _maybe_stop(spark)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="debgpt7_8_with_vectordb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--partitions", type=int, default=8)
        sp.add_argument("--out", default=None, help="write JSONL here instead of stdout")
        sp.add_argument("--limit", type=int, default=None)

    r = sub.add_parser("retrieve", help="top-k cosine retrieval with provenance")
    common(r)
    r.add_argument("--query-id", type=int, default=0)
    r.add_argument("-k", type=int, default=3)
    r.set_defaults(fn=cmd_retrieve)

    d = sub.add_parser("dump", help="S6 vdb dump (vector payload dropped)")
    common(d)
    d.set_defaults(fn=cmd_dump)

    i = sub.add_parser("index", help="bulk embed + partitioned IVF index build")
    common(i)
    i.add_argument("--dim", type=int, default=64)
    i.set_defaults(fn=cmd_index)
    # index writes parquet; --out is required
    def _index_check(a):
        if not a.out:
            i.error("--out is required for index")
        return cmd_index(a)
    i.set_defaults(fn=_index_check)

    m = sub.add_parser("mapreduce", help="map + tree-reduce over chunked docs")
    common(m)
    m.add_argument("--compact", action="store_true")
    m.set_defaults(fn=cmd_mapreduce)

    dd = sub.add_parser("dedup", help="dedup sweep")
    common(dd)
    dd.add_argument(
        "--method",
        choices=[
            "exact", "minhash", "simhash", "ngram", "embedding",
            "clusters", "semantic", "keep", "decontaminate", "mixture",
        ],
        default="exact",
    )
    dd.set_defaults(fn=cmd_dedup)

    q = sub.add_parser("query", help="run any catalog query by name")
    common(q)
    q.add_argument("--name", required=True)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("compact", help="compact small shards of a written corpus")
    common(c)
    c.add_argument("--path", required=True, help="corpus root (has a manifest)")
    c.add_argument("--target-mb", type=int, default=128)
    c.set_defaults(fn=cmd_compact)

    cu = sub.add_parser(
        "curate", help="WARC shards -> curated training documents"
    )
    common(cu)
    cu.add_argument("--warc", required=True, help="WARC file/dir/glob")
    cu.add_argument("--robots", default=None,
                    help="(host, robots_txt) table: .parquet or JSONL")
    cu.add_argument("--agent", default="sparkbot")
    cu.add_argument("--min-chars", type=int, default=100)
    cu.add_argument("--quality", action="store_true",
                    help="apply the C4 line + Gopher page gates")
    cu.add_argument("--report", action="store_true",
                    help="print the per-domain crawl report instead")
    cu.add_argument("--to-documents", action="store_true",
                    help="write the documents-table bridge as parquet to --out")
    cu.set_defaults(fn=cmd_curate)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
