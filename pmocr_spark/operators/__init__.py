"""Reusable operator implementations beyond the core pipeline:
multimodal column handling, plus the dedup/similarity/text-analysis
operators exposed through pmocr_spark.queries."""
