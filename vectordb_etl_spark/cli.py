"""CLI — mirrors the reference's ``main.py`` stage surface
(reference: main.py:466-573; stage choices at main.py:503-504).

    python -m vectordb_etl_spark --stage all --input-dir data/input
    python -m vectordb_etl_spark --stage search --query "서울 사무실 주소" --k 3
    python -m vectordb_etl_spark --stage reset --confirm
"""

from __future__ import annotations

import argparse
import json
import sys

from vectordb_etl_spark.config import (
    ChunkerConfig,
    EmbeddingConfig,
    PipelineConfig,
    StoreConfig,
)


def create_config(args: argparse.Namespace) -> PipelineConfig:
    """Reference: main.py:562-569 → config.py:129-157."""
    return PipelineConfig(
        input_dir=args.input_dir,
        checkpoint_dir=args.checkpoint_dir,
        chunker=ChunkerConfig(
            chunk_size=args.chunk_size, chunk_overlap=args.chunk_overlap
        ),
        embedding=EmbeddingConfig(dimension=args.dimension, backend=args.embedder),
        store=StoreConfig(
            warehouse_dir=args.warehouse,
            collection_prefix="hwp" if args.kind == "hwp" else "html",
        ),
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vectordb_etl_spark",
        description="PySpark-native document→vector ETL + retrieval engine",
    )
    p.add_argument(
        "--stage",
        choices=[
            "extract", "transform", "curate", "load", "validate", "search",
            "reset", "all",
        ],
        required=True,
    )
    p.add_argument(
        "--sample-fractions",
        default=None,
        help='curate: JSON dict of stratum->fraction, e.g. {"english": 0.5}',
    )
    p.add_argument(
        "--length-band",
        default=None,
        help="curate: keep chunks inside this percentile band of text "
        "length, e.g. '0.01,0.99'",
    )
    p.add_argument(
        "--boilerplate-max-frac",
        type=float,
        default=None,
        help="curate: drop chunks whose cross-doc shared-shingle fraction "
        "exceeds this threshold, e.g. 0.5",
    )
    p.add_argument(
        "--substring-dup-max-frac",
        type=float,
        default=None,
        help="curate: drop chunks whose exact substring-window duplicated "
        "fraction exceeds this threshold, e.g. 0.5",
    )
    p.add_argument("--kind", choices=["html", "hwp"], default="html")
    p.add_argument("--input-dir", default="data/input")
    p.add_argument("--checkpoint-dir", default="data/checkpoints")
    p.add_argument("--warehouse", default="data/warehouse")
    p.add_argument("--query", default=None)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--collection", default=None)
    p.add_argument("--language", default=None, help="search filter language")
    p.add_argument(
        "--filter",
        default=None,
        help="search: Milvus-style filter expression, e.g. "
        "'language == \"korean\" and chunk_index < 3'",
    )
    p.add_argument(
        "--index-kind",
        choices=["ivf", "graph"],
        default=None,
        help="search: serve through the store's per-collection indexes "
        "(un-indexed collections fall back to exact scan); default is "
        "the exact partition-pruned scan",
    )
    p.add_argument(
        "--filter-mode",
        choices=["post", "traversal"],
        default="post",
        help="search with --index-kind graph and a filter: 'post' filters "
        "the merged ef-beam (size ef to selectivity); 'traversal' filters "
        "during the beam (ACORN-style — ef stays k-sized at any "
        "selectivity)",
    )
    p.add_argument("--chunk-size", type=int, default=300)
    p.add_argument("--chunk-overlap", type=int, default=60)
    p.add_argument("--dimension", type=int, default=1024)
    p.add_argument("--embedder", choices=["hash", "sentence-transformer"], default="hash")
    p.add_argument(
        "--dynamic-meta", action="store_true",
        help="load: fold non-schema checkpoint columns into the meta map "
             "(enable_dynamic_field parity)",
    )
    p.add_argument("--confirm", action="store_true", help="required for reset")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--report", default=None, help="validate: JSON report path")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from vectordb_etl_spark.pipeline import PipelineRunner
    from vectordb_etl_spark.session import get_spark

    spark = get_spark("vectordb-etl-spark", extra_conf={"spark.master": args.master})
    runner = PipelineRunner(spark, create_config(args))

    if args.stage == "search":
        if not args.query:
            print("--query is required for --stage search", file=sys.stderr)
            return 2
        from vectordb_etl_spark.search import format_search_results

        hits = runner.search(
            args.query, k=args.k, collection=args.collection,
            filter_language=args.language, filter=args.filter,
            index_kind=args.index_kind, filter_mode=args.filter_mode,
        )
        print(format_search_results(hits))
        return 0

    if args.stage == "reset":
        n = runner.reset(confirm=args.confirm)
        print(f"dropped {n} collections")
        return 0

    if args.stage == "all":
        results = runner.run_all(args.input_dir, args.kind)
    elif args.stage == "extract":
        results = [runner.extract(args.input_dir, args.kind)]
    elif args.stage == "transform":
        results = [runner.transform()]
    elif args.stage == "curate":
        fractions = (
            json.loads(args.sample_fractions) if args.sample_fractions else None
        )
        band = None
        if args.length_band:
            lo_s, hi_s = args.length_band.split(",")
            band = (float(lo_s), float(hi_s))
        results = [
            runner.curate(
                sample_fractions=fractions,
                length_band=band,
                boilerplate_max_frac=args.boilerplate_max_frac,
                substring_dup_max_frac=args.substring_dup_max_frac,
            )
        ]
    elif args.stage == "load":
        results = [runner.load(dynamic_meta=args.dynamic_meta)]
    else:  # validate
        results = [runner.validate(report_path=args.report)]

    for r in results:
        # one JSON line per stage; "path" is the checkpoint directory — the
        # value an orchestrator passes to the next task (the reference DAGs'
        # XCom carries exactly this, dags/vectordb_etl_dag.py:80-81)
        line = {"stage": r.stage, "rows": r.rows, "seconds": round(r.seconds, 2)}
        if r.path:
            line["path"] = r.path
        if r.extra:
            line.update(r.extra)
        print(json.dumps(line, ensure_ascii=False, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
