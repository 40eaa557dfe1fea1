"""Webtext recast of the titanlib QC architecture (SURVEY.md §2.4).

A from-scratch PySpark language-ID + quality-filter + PII/toxicity-scrub
pipeline over Common-Crawl-style page tables
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Stage map (titanlib operator -> webtext stage):

* metadata_check      -> parse/schema validity (null url, empty text, undecodable html)
* range_check         -> Gopher/C4 heuristic bounds on doc-quality features
* range_check_climatology -> per-language thresholds from a broadcast lookup
* duplicate_check     -> url/content-hash dedup + intra-doc repeated-line ratios
* isolation_check     -> minimum-support guard for per-host relative scoring
* buddy_check         -> per-host z-score of quality features vs peers
* sct / sct_resistant -> perplexity outlier scoring vs neighborhood background
* (new)               -> langid pandas UDF, PII/toxicity scrub, salted writes,
                         per-partition checkpoint/lineage/metrics
"""

from titanlib_spark.webtext.schema import PAGES_SCHEMA, RESULT_COLUMNS
from titanlib_spark.webtext.generate import generate_pages
from titanlib_spark.webtext.extract import extract_text
from titanlib_spark.webtext.langid import langid
from titanlib_spark.webtext.scrub import scrub_text
from titanlib_spark.webtext.pipeline import QualityFilterConfig, run_quality_pipeline

__all__ = [
    "PAGES_SCHEMA",
    "RESULT_COLUMNS",
    "generate_pages",
    "extract_text",
    "langid",
    "scrub_text",
    "QualityFilterConfig",
    "run_quality_pipeline",
]
