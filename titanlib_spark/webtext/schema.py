"""Canonical schemas for the webtext pipeline.

Input table shape mandated by BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

The generator additionally emits `expected_*` label columns (the analogue
of the reference's seeded-gross-error `true_GE` vectors,
reference tests/sct_dual_test.py:20-31) used only by tests/bench scoring.
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

LABEL_FIELDS = [
    T.StructField("expected_keep", T.BooleanType(), True),
    T.StructField("expected_reason", T.StringType(), True),
    T.StructField("expected_scrubbed_text", T.StringType(), True),
]

PAGES_WITH_LABELS_SCHEMA = T.StructType(list(PAGES_SCHEMA.fields) + LABEL_FIELDS)

# Pipeline output columns (beyond the input passthrough).
RESULT_COLUMNS = [
    "flags",        # titanlib flag vocabulary: 0 good / 1 bad / 11,12 untestable
    "keep",         # flags == 0
    "reasons",      # array<string> of triggering rule names (empty when keep)
    "pred_lang",    # langid verdict
    "lang_score",   # langid confidence
    "scrubbed_text",  # PII/toxicity-scrubbed text (byte-deterministic)
]
