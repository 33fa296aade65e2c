"""spark-submit entry point (BASELINE.json:14: run via spark-submit
--py-files at two cluster sizes).

Usage:
    spark-submit --py-files kgce.zip kgce/submit.py \
        --input /path/pages_parquet --work-dir /path/work --buckets 64

Local sandbox equivalent (the session factory ships the package itself):
    SPARK_GRAFT_CPUS=32 python -m kgce.submit --input ... --work-dir ...
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--link-threshold", type=float, default=0.6)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--clean",
        action="store_true",
        help="run the crawl-hygiene pre-pass (url canonicalization, exact "
        "dedup, repetition filter) as a cached global stage before extraction",
    )
    args = ap.parse_args()

    from kgce import pipeline
    from kgce.session import get_spark

    spark = get_spark("kgce-submit", cores=args.cores)
    pages = spark.read.parquet(args.input)
    t0 = time.monotonic()
    clean = (
        {"canonical_urls": True, "exact_dedup": True, "repetition": True}
        if args.clean
        else None
    )
    out = pipeline.run_checkpointed(
        pages,
        args.work_dir,
        n_buckets=args.buckets,
        link_threshold=args.link_threshold,
        clean=clean,
    )
    n_triples = out["triples"].count()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "triples": n_triples,
                "wall_sec": round(wall, 2),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
