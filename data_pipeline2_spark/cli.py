"""CLI veneer — the engine analog of the reference's upload/status/search
CLI (doc_pipeline/cli/main.py:1-53).

Commands map 1:1 onto engine operators:
  ingest  <dir>            — binaryFile ingestion + MIME detect (upload path)
  status  <doc_id>         — point lookup + status projection
  search  <vec_id> [-k N]  — cosine kNN from a stored embedding vector
  chunk   <strategy>       — run a chunker over the documents table
  stats                    — corpus text stats
  query   <key> [-n N]     — run ANY registry operator by key
  list    [pattern]        — list available registry keys

All read from --data (default $SPARK_GRAFT_SF_DIR or sf0.01 testdata).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="data_pipeline2_spark")
    p.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="table directory (documents/embeddings/... parquet)",
    )
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("ingest", help="ingest a directory of raw files")
    sp.add_argument("dir")

    sp = sub.add_parser("status", help="document status lookup")
    sp.add_argument("doc_id", type=int)

    sp = sub.add_parser("search", help="kNN neighbors of a stored vector")
    sp.add_argument("vec_id", type=int)
    sp.add_argument("-k", type=int, default=10)

    sp = sub.add_parser("chunk", help="chunk the documents table")
    sp.add_argument(
        "strategy", choices=["fixed", "sentence", "markdown", "hybrid"]
    )
    sp.add_argument("--size", type=int, default=500)

    sub.add_parser("stats", help="corpus text stats")

    sp = sub.add_parser("query", help="run any registry operator by key")
    sp.add_argument("key")
    sp.add_argument("-n", type=int, default=20, help="rows to show")

    sp = sub.add_parser("list", help="list registry keys")
    sp.add_argument("pattern", nargs="?", default="")

    sp = sub.add_parser(
        "sql", help="run Spark SQL over the tables (registered as views)"
    )
    sp.add_argument("statement")
    sp.add_argument("-n", type=int, default=20, help="rows to show")

    sp = sub.add_parser("dedupe", help="corpus duplication report")
    sp.add_argument("--threshold", type=float, default=0.5,
                    help="near-dup jaccard threshold")

    sp = sub.add_parser("compact", help="compact small parquet files")
    sp.add_argument("path")
    sp.add_argument("--target-mb", type=int, default=128)

    sub.add_parser(
        "report", help="per-source curation report (gopher/c4/quality)"
    )

    args = p.parse_args(argv)

    if args.cmd == "query":
        # validate BEFORE paying Spark session startup
        from data_pipeline2_spark import registry

        if args.key not in registry.queries():
            close = [k for k in sorted(registry.queries()) if args.key in k][:8]
            hint = f" (did you mean: {', '.join(close)}?)" if close else ""
            print(f"unknown key {args.key!r}{hint}", file=sys.stderr)
            return 1

    if args.cmd == "list":
        # no Spark session needed to list
        from data_pipeline2_spark import registry

        for k in sorted(registry.queries()):
            if args.pattern in k:
                print(k)
        return 0

    from data_pipeline2_spark.session import get_spark

    spark = get_spark("dp2s-cli", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "ingest":
        from data_pipeline2_spark.sources.binary import ingest_binary_dir

        ingest_binary_dir(spark, args.dir).select(
            "doc_id", "filename", "content_type", "status"
        ).show(50, truncate=False)
    elif args.cmd == "status":
        from data_pipeline2_spark.operators.relational import point_lookup
        from data_pipeline2_spark.sources.parquet import load_table

        docs = load_table(spark, args.data, "documents")
        point_lookup(docs, "doc_id", args.doc_id).select(
            "doc_id", "lang", "source", "n_chars"
        ).show(truncate=False)
    elif args.cmd == "search":
        from data_pipeline2_spark.operators.similarity import knn_cosine
        from data_pipeline2_spark.sources.parquet import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, args.data, "embeddings")
        row = emb.filter(F.col("vec_id") == args.vec_id).select("embedding").collect()
        if not row:
            print(f"vec_id {args.vec_id} not found", file=sys.stderr)
            return 1
        knn_cosine(emb, row[0][0], k=args.k).show(truncate=False)
    elif args.cmd == "chunk":
        from data_pipeline2_spark.operators import chunking
        from data_pipeline2_spark.sources.parquet import load_table

        docs = load_table(spark, args.data, "documents")
        fn = {
            "fixed": lambda d: chunking.chunk_fixed(d, args.size),
            "sentence": lambda d: chunking.chunk_sentence(d, args.size),
            "markdown": lambda d: chunking.chunk_markdown(d),
            "hybrid": lambda d: chunking.chunk_hybrid(d, args.size),
        }[args.strategy]
        out = chunking.chunk_metadata_enrich(fn(docs), args.strategy)
        out.orderBy("doc_id", "pos").show(20)
        print(f"total chunks: {out.count()}")
    elif args.cmd == "stats":
        from data_pipeline2_spark.operators.textanalysis import text_stats
        from data_pipeline2_spark.sources.parquet import load_table

        text_stats(load_table(spark, args.data, "documents")).show(truncate=False)
    elif args.cmd == "query":
        from data_pipeline2_spark import registry

        df = registry.queries()[args.key](spark, args.data)
        df.show(args.n, truncate=False)
        print(f"rows: {df.count()}")
    elif args.cmd == "sql":
        from data_pipeline2_spark.sources.parquet import register_temp_views

        register_temp_views(spark, args.data)
        df = spark.sql(args.statement)
        df.show(args.n, truncate=False)
        print(f"rows: {df.count()}")
    elif args.cmd == "dedupe":
        from pyspark.sql import functions as F

        from data_pipeline2_spark.operators.dedup import (
            dedup_exact,
            near_dup_stats,
        )
        from data_pipeline2_spark.sources.parquet import load_table

        docs = load_table(spark, args.data, "documents")
        exact = dedup_exact(docs).filter(F.col("dup_count") > 1)
        n_exact_groups = exact.count()
        stats = near_dup_stats(docs, threshold=args.threshold).collect()[0]
        print(f"exact dup groups:  {n_exact_groups}")
        print(f"docs with text:    {stats.n_docs}")
        print(f"near-dup pairs:    {stats.n_dup_pairs} (jaccard >= {args.threshold})")
        frac = stats.dup_doc_fraction if stats.dup_doc_fraction is not None else 0.0
        print(f"docs in dup pairs: {stats.n_dup_docs} ({frac:.1%})")
    elif args.cmd == "compact":
        from data_pipeline2_spark.operators.writers import compact

        n_files = compact(spark, args.path, args.target_mb * 1024 * 1024)
        print(f"compacted {args.path}: {n_files} files at <= {args.target_mb} MB target")
    elif args.cmd == "report":
        from data_pipeline2_spark.operators.quality import curation_report
        from data_pipeline2_spark.sources.parquet import load_table

        docs = load_table(spark, args.data, "documents")
        rows = curation_report(docs).collect()
        for r in sorted(rows, key=lambda x: (x.source is None, x.source or "")):
            print(
                f"{r.source}: {r.n_docs} docs ({r.n_null_text} null), "
                f"gopher {r.gopher_pass_rate:.1%}, c4 {r.c4_pass_rate:.1%}, "
                f"quality {r.mean_quality if r.mean_quality is not None else 0.0:.3f}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
