"""Cross-document exact dedup — first-wins content-hash dedup.

The webtext recast of the reference's greedy first-wins duplicate_check
(reference src/duplicate_check.cpp:7-56: scan in order, keep row i, mark
later coincident rows). With an exact dedup key the order-sensitive greedy
scan collapses to a deterministic window:
``row_number() over (partition by content_hash order by warc_ts, url)``;
rank 1 is the kept original, everything else is a duplicate. One shuffle
on the hash; duplicate groups are tiny, so no skew handling is needed
(the hot-host skew lives in the *host* key, not the content hash).

Empty/null texts are excluded — they all share one hash but are not
duplicates of each other; the metadata stage owns them.

Near-dup (MinHash/SimHash/Jaccard) lives in titanlib_spark.textops.dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from titanlib_spark.webtext.heuristics import is_empty_text


def content_hash(text_col: str | Column = "text") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(c)


def is_duplicate(
    df: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("warc_ts", "url"),
    out_col: str = "is_duplicate",
    hash_col: str | None = None,
) -> DataFrame:
    """Attach a boolean `is_duplicate` column (first occurrence False).

    Pass `hash_col` (null = non-hashable/empty doc) to dedup on a
    precomputed content hash — the pipeline does this so the window
    shuffle never carries raw text."""
    if hash_col is not None:
        hashable = F.col(hash_col).isNotNull()
        h_raw = F.col(hash_col)
    else:
        hashable = ~is_empty_text(text_col)
        h_raw = F.when(hashable, content_hash(text_col))
    # non-hashable rows partition by their own url (singleton groups) so the
    # null-hash bucket can't become one giant skewed window partition
    h = F.coalesce(h_raw, F.concat(F.lit("_nohash_"), F.col(order_cols[-1])))
    w = Window.partitionBy(h).orderBy(*[F.col(c).asc() for c in order_cols])
    rn = F.row_number().over(w)
    return df.withColumn(out_col, hashable & (rn > 1))
