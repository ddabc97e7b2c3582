"""spark-submit entry point — flag parity with pmOCR (F7-F10).

pmOCR CLI (Usage, /root/reference/pmocr.sh:2296-2343): --batch/--service,
-p/--target=pdf, -t/--target=txt, -c/--target=csv, -k/--skip-txt-pdf,
-d/--delete-input, --suffix=, --no-suffix, --text=/--filename-addition=.
Mapped here onto the table-native equivalents; config-file < CLI
precedence preserved (GetCommandlineArguments runs twice in the
reference, pmocr.sh:2409/2423 — argparse defaults + overrides here).

Usage:
  spark-submit --py-files pmocr_spark.zip -m pmocr_spark.cli \\
      --batch --input DIR --blobs DIR --output DIR --lineage DIR \\
      --targets txt,csv --job-ts 2024-01-01T00:00:00Z
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pmocr-spark")
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--batch", action="store_true", help="bounded batch run")
    mode.add_argument(
        "--service", action="store_true", help="streaming monitor mode (pmOCR --service)"
    )
    p.add_argument("--input", required=True, help="documents table / landing dir (parquet)")
    p.add_argument("--blobs", required=True, help="media_blobs table (parquet)")
    p.add_argument("--output", required=True, help="results table dir")
    p.add_argument("--lineage", required=True, help="checkpoint/lineage table dir")
    p.add_argument(
        "--targets",
        default="txt",
        help="comma list of txt,csv,pdf (pmOCR default: pdf, pmocr.sh:2449-2451; "
        "ours: txt — all targets derive from one OCR pass either way)",
    )
    p.add_argument("--run-id", default="run-0")
    p.add_argument(
        "--job-ts",
        default="2024-01-01T00:00:00Z",
        help="fixed job timestamp for output naming/lineage (never wall clock)",
    )
    p.add_argument("--stream-checkpoint", default=None, help="streaming offsets dir (service)")
    p.add_argument("--master", default=None, help="override spark master (default from env)")
    p.add_argument("--num-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> None:
    from pyspark.sql import functions as F

    from . import checkpoint as ckpt
    from . import pipeline, streaming
    from .session import get_spark

    args = build_parser().parse_args(argv)
    targets = [t.strip() for t in args.targets.split(",") if t.strip()]
    spark = get_spark(app="pmocr_spark_job", master=args.master)

    if args.service:
        blobs = spark.read.parquet(args.blobs)
        q = streaming.monitor(
            spark,
            args.input,
            blobs,
            args.output,
            args.stream_checkpoint or args.lineage + "_offsets",
            args.lineage,
            run_id=args.run_id,
            job_ts=args.job_ts.replace("T", " ").replace("Z", ""),
            trigger={"processingTime": "30 seconds"},  # poller interval parity
        )
        q.awaitTermination()
        return

    docs = spark.read.parquet(args.input)
    blobs = spark.read.parquet(args.blobs)
    lineage = ckpt.read_checkpoint(spark, args.lineage)
    results = pipeline.run_batch(
        spark, docs, blobs, checkpoint=lineage, num_partitions=args.num_partitions
    )
    results = results.persist()
    cols = ["doc_id", "spans", "span_count", "error_count", "status"]
    cols += [t for t in ("txt", "csv") if t in targets]
    if "pdf" in targets:
        # pdf target = ordered struct list retaining media refs (FIXTURES §2)
        results = results.withColumn("pdf", F.to_json("spans"))
        cols.append("pdf")
    results.select(*cols).write.mode("append").parquet(args.output)
    rows = ckpt.checkpoint_rows(
        results, run_id=args.run_id, job_ts=args.job_ts.replace("T", " ").replace("Z", "")
    )
    ckpt.append_checkpoint(rows, args.lineage)
    results.unpersist()


if __name__ == "__main__":
    main()
