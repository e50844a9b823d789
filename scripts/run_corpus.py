"""Production entrypoint: the corpus-hygiene pipeline as a spark-submit job
(the documents-table sibling of scripts/run_pipeline.py).

    spark-submit --master <cluster> --py-files build/hexspark.zip \\
        scripts/run_corpus.py \\
        --input <path or table of documents(doc_id, text, <domain>, ...)> \\
        --workdir <stage-table root> \\
        [--id-col doc_id] [--text-col text] [--domain-col lang] \\
        [--max-perplexity 1000]   # enable the CCNet-style LM gate \\
        [--no-near-dup]           # exact dedup only \\
        [--neardup-bands 16] [--neardup-max-dist 40] \\
        [--mixture en=0.5,de=0.25,fr=0.25] [--mixture-scale 1.0]

Stages (scrubbed -> quality -> deduped -> corpus) materialize to the
workdir, complete stages are skipped on rerun, and a config change on a
shared workdir is refused — see pipeline/corpus.py. Exit output is one
JSON line with per-stage rows and the manifest location.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def _parse_mixture(spec: str) -> dict[str, float] | None:
    if not spec:
        return None
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not name or not w:
            raise SystemExit(f"--mixture entries must be domain=weight (got {part!r})")
        out[name.strip()] = float(w)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path or table")
    ap.add_argument("--workdir", required=True, help="stage output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--domain-col", default="lang")
    ap.add_argument(
        "--max-perplexity", type=float, default=None,
        help="enable the LM quality gate: drop documents whose bigram-LM "
             "perplexity (model trained on this run's repetition-passing "
             "slice) exceeds this",
    )
    ap.add_argument("--lm-min-count", type=int, default=2)
    ap.add_argument(
        "--lm-order", type=int, default=2, choices=(2, 3),
        help="LM family for the perplexity gate: 2 = add-k bigram, "
             "3 = interpolated Kneser-Ney trigram (KenLM-family)",
    )
    ap.add_argument(
        "--no-near-dup", action="store_true",
        help="skip the SimHash near-dup stage (exact md5 dedup only)",
    )
    ap.add_argument("--neardup-bands", type=int, default=16)
    ap.add_argument("--neardup-max-dist", type=int, default=40)
    ap.add_argument(
        "--max-span-dup-frac", type=float, default=None,
        help="enable the span-level exact-substring gate: drop documents "
             "whose cross-document duplicated-span token fraction exceeds "
             "this (the ExactSubstr flag-and-drop pass)",
    )
    ap.add_argument("--span-min-len", type=int, default=20)
    ap.add_argument(
        "--mixture", default="",
        help="target output mixture as domain=weight[,domain=weight...]; "
             "water-line downsampling (binding domain keeps 100%%); "
             "unlisted domains are dropped",
    )
    ap.add_argument("--mixture-scale", type=float, default=1.0)
    args = ap.parse_args()

    from hexspark.pipeline.corpus import CorpusConfig, CorpusRunner

    spark = SparkSession.builder.appName("hexspark-corpus").getOrCreate()
    docs = (
        spark.read.parquet(args.input)
        if os.path.exists(args.input) or args.input.endswith(".parquet")
        else spark.table(args.input)
    )
    cfg = CorpusConfig(
        id_col=args.id_col,
        text_col=args.text_col,
        domain_col=args.domain_col,
        max_perplexity=args.max_perplexity,
        lm_min_count=args.lm_min_count,
        lm_order=args.lm_order,
        near_dup=not args.no_near_dup,
        neardup_bands=args.neardup_bands,
        neardup_max_dist=args.neardup_max_dist,
        max_span_dup_frac=args.max_span_dup_frac,
        span_min_len=args.span_min_len,
        mixture_weights=_parse_mixture(args.mixture),
        mixture_scale=args.mixture_scale,
    )
    result = CorpusRunner(spark, args.workdir, cfg).run(docs)
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "stage_rows": result.stage_rows,
                "manifest": os.path.join(args.workdir, "corpus_manifest.json"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
