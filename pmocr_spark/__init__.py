"""pmocr_spark — a from-scratch PySpark-native OCR-extraction engine.

Capabilities mirror deajan/pmOCR (reference at /root/reference, see
SURVEY.md): batch + streaming document extraction over a table of
interleaved text+media documents, with multi-target txt/csv/pdf outputs,
failure quarantine, and idempotent anti-join resume — re-expressed as
DataFrame/Catalyst/Structured-Streaming plans with vectorized
pandas/Arrow UDF media-decode stages.
"""

__version__ = "0.1.0"
