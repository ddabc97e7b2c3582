#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1: measure first).

bench.py is FROZEN for driver measurement; everything exploratory lives
here. Modes:

  python bench_extra.py --queries [names...]   per-query isolation: noop
      force of each headline catalog query, repeated, with the Spark
      status-API stage delta (executor run/cpu seconds, task counts,
      shuffle bytes) recorded next to the wall time — separates driver/
      planning cost from executor work (§1.1/§1.4).
  python bench_extra.py --named [names...]     the non-catalog bench
      entries (ocr_pipeline, bm25, phash, ...) reusing bench.py's own
      functions unmodified.
  python bench_extra.py --plans TAG [names...] write .explain("formatted")
      for each catalog query to plans/r06/<name>_<TAG>.txt.

Results land in BENCH/r06_probe_<label>.json (one file per invocation,
labelled via --label) so before/after evidence is diffable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import bench  # the frozen harness: reuse its helpers verbatim


def _explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def _measured(spark, fn, repeats: int = 2) -> dict:
    """Run fn() -> DataFrame `repeats` times through the noop sink,
    recording wall seconds and the stage-metric delta per run."""
    runs = []
    for _ in range(repeats):
        before = bench._stage_snapshot(spark)
        t0 = time.time()
        df = fn()
        built = time.time() - t0  # driver-side: query construction
        bench._force(df)
        wall = time.time() - t0
        time.sleep(0.4)
        delta = bench._stage_delta(spark, before, bench._stage_snapshot(spark))
        runs.append(
            {
                "sec": round(wall, 3),
                "build_sec": round(built, 3),
                "executor_run_s": delta["executor_run_s"],
                "executor_cpu_s": delta["executor_cpu_s"],
                "stages": delta["stages"],
                "tasks": delta["tasks"],
                "shuffle_write_mb": delta["shuffle_write_mb"],
                "top_stages": delta["top_stages"],
            }
        )
    return {"runs": runs, "min_sec": min(r["sec"] for r in runs)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    label = "probe"
    args = list(sys.argv[1:])
    if "--label" in args:
        i = args.index("--label")
        label = args[i + 1]
        del args[i : i + 2]
    mode = args[0] if args else "--queries"
    names = args[1:]

    from pmocr_spark.queries import QUERY_FNS

    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "host_probe": bench._host_probe()}
    print(f"[extra] host probe: {out['host_probe']}", file=sys.stderr, flush=True)

    if mode == "--plans":
        tag = names[0]
        qnames = names[1:] or [n for n in bench.HEADLINE if n in QUERY_FNS]
        spark = bench._make_spark(cpus)
        os.makedirs("plans/r06", exist_ok=True)
        for name in qnames:
            df = QUERY_FNS[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(_explain_formatted(df))
            print(f"[extra] plan written: {name}_{tag}", file=sys.stderr, flush=True)
        spark.stop()
        return

    spark = bench._make_spark(
        cpus, extra={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"}
    )

    if mode == "--named":
        import tempfile

        with tempfile.TemporaryDirectory(prefix="pmocr_extra_") as tmp:
            bench._prep_ocr_corpus(tmp, bench.OCR_BENCH_DOCS)
            bench._warm_python_workers(spark, tmp)
            todo = names or [
                "ocr_pipeline", "html_extract", "phash_near_dup", "srp_near_dup",
                "bpe_learn", "video_transcribe", "word_boxes", "unigram_train",
                "bm25_index_search", "warc_ingest",
            ]
            for name in todo:
                before = bench._stage_snapshot(spark)
                t0 = time.time()
                if name == "ocr_pipeline":
                    r = bench._bench_ocr(spark, tmp, bench.OCR_BENCH_DOCS)
                elif name == "html_extract":
                    r = bench._bench_html(spark, sf_dir)
                elif name == "phash_near_dup":
                    r = bench._bench_phash(spark, tmp)
                elif name == "srp_near_dup":
                    r = bench._bench_srp(spark, sf_dir)
                elif name == "bpe_learn":
                    r = bench._bench_bpe(spark, sf_dir)
                elif name == "video_transcribe":
                    r = bench._bench_video(spark, sf_dir)
                elif name == "word_boxes":
                    r = bench._bench_word_boxes(spark, sf_dir)
                elif name == "unigram_train":
                    r = bench._bench_unigram(spark, sf_dir)
                elif name == "bm25_index_search":
                    r = bench._bench_bm25(spark, sf_dir, tmp)
                elif name == "warc_ingest":
                    r = bench._bench_warc(spark, sf_dir, tmp)
                else:
                    continue
                time.sleep(0.4)
                delta = bench._stage_delta(spark, before, bench._stage_snapshot(spark))
                out[name] = {
                    **r,
                    "wall_with_setup": round(time.time() - t0, 3),
                    "executor_run_s": delta["executor_run_s"],
                    "executor_cpu_s": delta["executor_cpu_s"],
                    "stages": delta["stages"],
                    "tasks": delta["tasks"],
                    "shuffle_write_mb": delta["shuffle_write_mb"],
                }
                print(f"[extra] {name}: {r['sec']}s "
                      f"(exec run {delta['executor_run_s']}s over {delta['tasks']} tasks, "
                      f"{delta['stages']} stages)", file=sys.stderr, flush=True)
    else:
        # spin up the python-worker pool (bench._warm_python_workers needs
        # the blob corpus; a tiny pandas-UDF job over documents suffices)
        import pandas as pd
        from pyspark.sql import functions as F

        def _ident(s):
            return s

        _noopu = F.pandas_udf(_ident, "long")

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bench._force(docs.repartition(npart).select(_noopu("doc_id")))
        todo = names or [n for n in bench.HEADLINE if n in QUERY_FNS]
        for name in todo:
            res = _measured(spark, lambda n=name: QUERY_FNS[n](spark, sf_dir))
            out[name] = res
            r0 = res["runs"][0]
            print(
                f"[extra] {name}: {[r['sec'] for r in res['runs']]} "
                f"(run1 build {r0['build_sec']}s, exec run {r0['executor_run_s']}s, "
                f"{r0['stages']} stages / {r0['tasks']} tasks, "
                f"shuffle {r0['shuffle_write_mb']} MB)",
                file=sys.stderr, flush=True,
            )

    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    path = f"BENCH/r06_probe_{label}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "host_probe": out["host_probe"]}))


if __name__ == "__main__":
    main()
