"""Cross-batch streaming NEAR-duplicate detection via MinHash-LSH state.

Exact cross-batch dedup (streaming/pipeline.mark_cross_batch_dups) keys the
state store on a full-content hash, so a recrawl with one changed byte slips
through. This module extends the same state-store idiom to NEAR duplicates
(the streaming face of textops/dedup.py's batch MinHash-LSH family,
recasting reference src/duplicate_check.cpp's keep-first-occurrence rule):

* signature: a row-local vectorized pandas UDF computes the page's MinHash
  signature with integer math IDENTICAL to textops.dedup.minhash_signatures'
  md5 mode (same md5-derived 60-bit base hash, same seeded (a,b) permutation
  coefficients, same Mersenne-31 modulus) — no gram explode ever enters the
  stream, no shuffle on the map side.
* banding: the signature's LSH bands become state keys; one explode to
  `bands` SLIM rows (key, band, bucket) — the page payload never rides
  along (at web scale a 16x payload replication through the state shuffle
  would dominate; the slim rows are ~50 bytes each).
* state: applyInPandasWithState keyed by (band, bucket). A bucket's state
  is one bit — "claimed by an earlier micro-batch" — so state size is the
  number of DISTINCT buckets ever seen, and per-trigger work is
  O(batch_rows x bands) keyed lookups. Nothing re-reads the sink.
* verdict: a page is a near-dup candidate iff ANY of its band buckets was
  already claimed — the per-page OR runs as a batch-local groupBy inside
  foreachBatch (fold_near_dup_verdicts), because update-mode streaming
  forbids a second stateful operator after applyInPandasWithState.

Determinism: within a micro-batch the rows of a bucket group are sorted by
the page key inside the state function, so the same page claims the bucket
no matter how Arrow chunks arrive; verdicts are therefore replay-stable and
exactly reproduced by the batch twin near_dup_marks_batch, whose DuckDB SQL
twin drives the correctness gate (streaming_near_dups).

False positives follow the LSH gate (a band collision is a candidate, not a
verified pair): with 16 bands of 4 slots the gate recalls >99% of pairs at
jaccard >= 0.5 while passing ~s^4-per-band noise — the same operating point
as the batch minhash_lsh_candidates. Use the verdict as a CANDIDATE flag
(route to an exact verify or a quarantine partition) when precision
matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, IntegerType, LongType, StructField, StructType

from titanlib_spark.textops.dedup import MERSENNE31, _minhash_coeffs

_PAYLOAD_BAND = -1
_ROWKEY_PREFIX = "_row:"


def minhash_sig_udf(shingle_size: int = 5, num_hashes: int = 64):
    """Vectorized row-local MinHash signature (array<long>, null when the
    document has no shingle) — bit-identical to minhash_signatures'
    hash_fn="md5" path: h = conv(substr(md5(gram),1,15),16,10) % P, then
    sig_i = min over grams of (a_i*h + b_i) % P with the same seeded
    coefficients. Row-local so a stream can carry signatures without a
    gram explode/shuffle.

    This UDF is the MEASURED winner of the streaming signature A/B
    (scripts/streaming_sig_ab.py, 1e5 generated pages, local[32]):
    27.7k docs/s vs 4.7k for the row-local JVM HOF twin
    (:func:`minhash_sig_column`) — the twin's k x n_shingles interpreted
    aggregate min-folds cost ~6x the one-Python-md5-per-shingle loop
    plus numpy permutation math here. Signatures are bit-identical
    (asserted by the same script), so either can replay the other."""
    a_list, b_list = _minhash_coeffs(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        a = np.asarray(a_list, dtype=np.int64)[:, None]
        b = np.asarray(b_list, dtype=np.int64)[:, None]
        out = []
        for t in text.to_numpy(dtype=object):
            if not isinstance(t, str):
                out.append(None)
                continue
            low = t.lower()
            if len(low) < shingle_size:
                out.append(None)
                continue
            grams = set(
                low[i : i + shingle_size]
                for i in range(len(low) - shingle_size + 1)
            )
            h = np.fromiter(
                (
                    int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                    % MERSENNE31
                    for g in grams
                ),
                dtype=np.int64,
                count=len(grams),
            )[None, :]
            out.append(((a * h + b) % MERSENNE31).min(axis=1).tolist())
        return pd.Series(out, dtype=object)

    return _sig


def minhash_sig_column(
    text_col: str | Column = "text",
    shingle_size: int = 5,
    num_hashes: int = 64,
) -> Column:
    """Row-local JVM twin of :func:`minhash_sig_udf`: the same md5-mode
    signature as a pure Catalyst expression — let-bound distinct shingles
    -> one md5 per shingle (transform) -> k interpreted `aggregate`
    min-folds. No explode, no shuffle, no Python worker: usable in a
    streaming select exactly like the UDF. NULL when the document has no
    shingle. Bit-identical to the UDF and to minhash_signatures' md5 mode
    (same hash, same seeded coefficients, same modulus).

    Cost shape: the k min-folds run in Spark's interpreted HOF path
    (~k x n_shingles interpreted ops per doc) vs the UDF's one Python md5
    call per shingle + vectorized numpy permutation math — which side
    wins is measured, not guessed (scripts/streaming_sig_ab.py)."""
    from titanlib_spark.textops.dedup import (
        char_shingles,
        let_bound,
        md5_hash64,
    )

    a_list, b_list = _minhash_coeffs(num_hashes)
    sh = char_shingles(text_col, shingle_size)
    hashed = F.transform(sh, lambda s: md5_hash64(s) % MERSENNE31)

    def sig_of(hs: Column) -> Column:
        def fold(av: int, bv: int):
            # factory closure: aggregate lambdas must take exactly their
            # arity — no default-arg captures (CLAUDE.md rule 6)
            def step(acc: Column, h: Column) -> Column:
                return F.least(acc, (F.lit(av) * h + F.lit(bv)) % MERSENNE31)

            return step

        return F.when(
            F.size(hs) > 0,
            F.array(
                *[
                    F.aggregate(
                        hs,
                        F.lit(MERSENNE31).cast("long"),
                        fold(a_list[i], b_list[i]),
                    )
                    for i in range(num_hashes)
                ]
            ),
        )

    return let_bound(hashed, sig_of)


def band_buckets(sig: Column, num_hashes: int = 64, bands: int = 16) -> Column:
    """LSH band bucket keys: array of `bands` slice-strings — the same
    concat_ws(",", slice(sig, b*r+1, r)) keys minhash_lsh_candidates uses
    in md5 mode (trivially equal to DuckDB's array_to_string)."""
    r = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat_ws(",", F.slice(sig, b * r + 1, r)),
    )


def mark_cross_batch_near_dups(
    stream: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 5,
    bands: int = 16,
) -> DataFrame:
    """Streaming stage: returns a stream of the original payload rows
    (`_band` = -1) interleaved with slim per-band rows (`_band` >= 0,
    `_xb_near_hit` set), ready for fold_near_dup_verdicts inside
    foreachBatch. `key_col` must be row-unique within the stream (use a
    surrogate id for recrawl-heavy sources) — it is the per-page fold key
    and the within-batch tiebreak."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    orig_cols = stream.schema.fields
    sig = minhash_sig_udf(shingle_size, num_hashes)(F.col(text_col))

    # slim band rows: (key, band, bucket) + payload columns as typed nulls
    # so both row kinds share one schema through the single stateful stage
    band_rows = (
        stream.withColumn("_sig", sig)
        .where(F.col("_sig").isNotNull())
        .select(
            F.col(key_col),
            F.posexplode(band_buckets(F.col("_sig"), num_hashes, bands)).alias(
                "_band", "_bucket"
            ),
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in orig_cols
                if f.name != key_col
            ],
        )
        .select(
            *[F.col(f.name) for f in orig_cols], F.col("_band"), F.col("_bucket")
        )
    )
    # payload rows: group key is the row itself (prefixed so it can never
    # collide with a signature bucket); the state fn passes them through
    # and writes no state, so they cost one keyed lookup each
    payload_rows = stream.select(
        *[F.col(f.name) for f in orig_cols],
        F.lit(_PAYLOAD_BAND).alias("_band"),
        F.concat(F.lit(_ROWKEY_PREFIX), F.col(key_col).cast("string")).alias(
            "_bucket"
        ),
    )
    un = band_rows.unionByName(payload_rows)

    out_schema = StructType(
        list(un.schema.fields) + [StructField("_xb_near_hit", BooleanType())]
    )
    state_schema = StructType([StructField("claimed", IntegerType())])

    def update(key, pdfs, state):
        band = key[0]
        if band == _PAYLOAD_BAND:
            for pdf in pdfs:
                pdf["_xb_near_hit"] = None
                yield pdf
            return
        chunks = [pdf for pdf in pdfs]
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # deterministic within-batch claim order: sort by the page key so
        # Arrow chunk arrival order can never change who wins the bucket
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        seen = state.exists
        hits = [True] * len(pdf)
        if not seen and hits:
            hits[0] = False
        pdf["_xb_near_hit"] = pd.Series(hits, dtype=object)
        state.update((1,))
        yield pdf

    return un.groupBy("_band", "_bucket").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fold_near_dup_verdicts(
    batch_df: DataFrame, key_col: str = "url", assert_unique: bool = True
) -> DataFrame:
    """Batch-local fold (run inside foreachBatch): collapse the marked
    band rows onto their payload rows as one boolean `_xb_near_dup` —
    true iff ANY band bucket was already claimed. Pages with no signature
    (too-short/NULL text) have no band rows and fold to false.

    `assert_unique` (default on) fails loud when `key_col` is NOT
    row-unique within the micro-batch (recrawls keyed by url): duplicate
    keys would silently fan one verdict across all payload rows of the
    key and make the within-bucket claim tiebreak ambiguous. The check is
    one partial-agg count over the slim key column per micro-batch; pass
    False only if the source guarantees uniqueness upstream."""
    hits = (
        batch_df.where(F.col("_band") >= 0)
        .groupBy(key_col)
        .agg(F.max("_xb_near_hit").alias("_xb_near_dup"))
    )
    payload = batch_df.where(F.col("_band") == _PAYLOAD_BAND).drop(
        "_band", "_bucket", "_xb_near_hit"
    )
    if assert_unique:
        dup = (
            payload.groupBy(key_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"fold_near_dup_verdicts: key_col={key_col!r} is not "
                f"row-unique in this micro-batch (e.g. {dup[0][key_col]!r} "
                f"x{dup[0]['count']}); stamp a surrogate key upstream or "
                "pass assert_unique=False if uniqueness is guaranteed."
            )
    return payload.join(F.broadcast(hits), on=key_col, how="left").withColumn(
        "_xb_near_dup", F.coalesce(F.col("_xb_near_dup"), F.lit(False))
    )


def near_dup_marks_batch(
    df: DataFrame,
    batch_col: str = "batch_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 5,
    bands: int = 16,
) -> DataFrame:
    """Batch-replay twin of the streaming stage: a doc is a near-dup
    candidate iff any of its LSH band buckets is also held by a doc with a
    smaller (batch, id) — exactly the claim order the streaming state
    store plus the sorted within-batch tiebreak produces. Pure DataFrame
    ops over the SAME signature path (minhash_signatures md5 mode), so the
    whole composition has a DuckDB SQL twin and goes through the value
    oracle. Returns (id_col, batch_col, near_dup:boolean) for every input
    row; docs with no shingles are never candidates."""
    from pyspark.sql import Window

    from titanlib_spark.textops.dedup import minhash_signatures

    base = df.select(batch_col, id_col, text_col)
    sigs = minhash_signatures(
        base, text_col, num_hashes, shingle_size, id_col=id_col, hash_fn="md5"
    ).where(F.col("minhash").isNotNull())
    banded = sigs.select(
        F.col(batch_col),
        F.col(id_col),
        F.posexplode(band_buckets(F.col("minhash"), num_hashes, bands)).alias(
            "_band", "_bucket"
        ),
    )
    w = Window.partitionBy("_band", "_bucket")
    me = F.struct(F.col(batch_col), F.col(id_col))
    hit = me > F.min(me).over(w)
    marks = (
        banded.withColumn("_hit", hit)
        .groupBy(batch_col, id_col)
        .agg(F.max("_hit").alias("near_dup"))
    )
    return (
        df.select(batch_col, id_col)
        .join(marks, on=[batch_col, id_col], how="left")
        .withColumn("near_dup", F.coalesce(F.col("near_dup"), F.lit(False)))
    )
