"""Deterministic synthetic Common-Crawl-style page generator.

The webtext analogue of the reference's seeded-gross-error test data
(reference tests/sct_dual_test.py:20-31 plants errors at rate pGE and keeps
a `true_GE` label vector; tests/util.py:4-13 seeds every generator).

Every row is a pure function of (seed, doc index i):

* category      = i % 100             (arithmetic, so duplicate docs can
                                       reference their base doc's text)
* host          = Zipf-skewed from a hash of i (host 0 is deliberately hot —
                  the webtext analogue of the reference's dense station
                  clusters, the skew pathology SURVEY.md §7 flags)
* content       = numpy Generator seeded per doc

Category layout (out of each run of 100 docs):

| i%100  | category        | expected_keep | planted defect                    |
|--------|-----------------|---------------|-----------------------------------|
| 0-63   | clean_en        | True          | —                                 |
| 64-69  | clean_xx        | True          | — (de/fr/es round-robin)          |
| 70-73  | gibberish       | False         | random chars: no stopwords, high perplexity |
| 74-77  | too_short       | False         | ~5 words                          |
| 78-81  | repeated_line   | False         | one line repeated 8x              |
| 82-85  | pii_en          | True          | email/phone/IP (scrub rewrites)   |
| 86-88  | toxic_en        | True          | toxicity-lexicon words (scrubbed) |
| 89-92  | symbol_heavy    | False         | '#' prefixes on ~40% of words     |
| 93-95  | long_words      | False         | 18-char tokens                    |
| 96     | empty_text      | False         | text = ''                         |
| 97     | blank_text      | False         | text = whitespace                 |
| 98-99  | duplicate       | False         | byte-copy of doc (i//100)*100     |

Generation is distributed: ``spark.range(n).mapInPandas(...)`` — each task
generates only its id range, so the generator itself scales to the bench
sizes without driver materialization.
"""

from __future__ import annotations

import datetime

import numpy as np

from titanlib_spark.webtext.lexicon import CONTENT_WORDS, STOPWORDS, TOXICITY_LEXICON
from titanlib_spark.webtext.schema import PAGES_WITH_LABELS_SCHEMA
from titanlib_spark.webtext.scrub import reference_scrub

_BASE_TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _category(i: int) -> str:
    c = i % 100
    if c < 64:
        return "clean_en"
    if c < 70:
        return "clean_xx"
    if c < 74:
        return "gibberish"
    if c < 78:
        return "too_short"
    if c < 82:
        return "repeated_line"
    if c < 86:
        return "pii_en"
    if c < 89:
        return "toxic_en"
    if c < 93:
        return "symbol_heavy"
    if c < 96:
        return "long_words"
    if c == 96:
        return "empty_text"
    if c == 97:
        return "blank_text"
    return "duplicate"


_KEEP = {"clean_en", "clean_xx", "pii_en", "toxic_en"}


def _line(rng: np.random.Generator, lang: str, n_words: int) -> str:
    stops, content = STOPWORDS[lang], CONTENT_WORDS[lang]
    words = []
    for _ in range(n_words):
        pool = stops if rng.random() < 0.45 else content
        words.append(pool[int(rng.integers(0, len(pool)))])
    return " ".join(words) + "."


def _clean_text(rng: np.random.Generator, lang: str) -> str:
    paras = []
    for _ in range(int(rng.integers(2, 5))):
        lines = [_line(rng, lang, int(rng.integers(9, 17))) for _ in range(int(rng.integers(2, 5)))]
        paras.append("\n".join(lines))
    return "\n\n".join(paras)


def _gibberish(rng: np.random.Generator) -> str:
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lines = []
    for _ in range(6):
        words = [
            "".join(alphabet[rng.integers(0, 26, size=int(rng.integers(3, 9)))])
            for _ in range(12)
        ]
        lines.append(" ".join(words) + ".")
    return "\n".join(lines)


def _doc_text(i: int, seed: int) -> tuple[str, str]:
    """Return (text, true_lang) for doc i. Pure function of (seed, i)."""
    cat = _category(i)
    if cat == "duplicate":
        base = (i // 100) * 100  # category(base) == clean_en
        return _doc_text(base, seed)
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(2**32) + np.uint64(i))
    if cat in ("clean_en", "pii_en", "toxic_en", "symbol_heavy"):
        text, lang = _clean_text(rng, "en"), "en"
        if cat == "pii_en":
            name = f"user{i}"
            pii = (
                f"contact {name}@example.com or call 555-{int(rng.integers(100,999))}-"
                f"{int(rng.integers(1000,9999))} from 192.168.{int(rng.integers(0,255))}."
                f"{int(rng.integers(1,255))} now."
            )
            text = text + "\n\n" + pii
        elif cat == "toxic_en":
            tox = " ".join(
                TOXICITY_LEXICON[int(rng.integers(0, len(TOXICITY_LEXICON)))]
                for _ in range(3)
            )
            text = text + "\n\n" + "this " + tox + " thing is broken."
        elif cat == "symbol_heavy":
            words = text.split(" ")
            marked = [
                ("#" + w) if rng.random() < 0.4 else w for w in words
            ]
            text = " ".join(marked)
        return text, "en"
    if cat == "clean_xx":
        lang = ("de", "fr", "es")[i % 3]
        return _clean_text(rng, lang), lang
    if cat == "gibberish":
        return _gibberish(rng), "und"
    if cat == "too_short":
        return _line(rng, "en", 5), "en"
    if cat == "repeated_line":
        line = _line(rng, "en", 11)
        other = _line(rng, "en", 11)
        return "\n".join([line] * 8 + [other]), "en"
    if cat == "long_words":
        alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        words = [
            "".join(alphabet[rng.integers(0, 26, size=18)]) for _ in range(30)
        ]
        return " ".join(words) + ".", "en"
    if cat == "empty_text":
        return "", "en"
    if cat == "blank_text":
        return "   ", "en"
    raise AssertionError(cat)


def _host_id(i: int, n_hosts: int) -> int:
    """Zipf-ish host assignment: u^3 concentrates mass on low host ids
    (host 0 receives ~(1/n_hosts)^(1/3) of all docs — a genuine hot key)."""
    u = ((i * 2654435761) % 2**32) / 2**32
    return int(n_hosts * u**3)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_html(text: str, title: str) -> bytes:
    paras = "".join(f"<p>{_escape(p)}</p>" for p in text.split("\n\n")) if text else ""
    return (
        f"<html><head><title>{_escape(title)}</title></head>"
        f"<body>{paras}</body></html>"
    ).encode("utf-8")


def _reason(cat: str) -> str | None:
    return {
        "gibberish": "stopword_ratio",
        "too_short": "min_words",
        "repeated_line": "dup_line_frac",
        "symbol_heavy": "symbol_ratio",
        "long_words": "mean_word_length",
        "empty_text": "empty_text",
        "blank_text": "empty_text",
        "duplicate": "duplicate",
    }.get(cat)


def generate_rows(ids, seed: int = 42, n_hosts: int = 200):
    """Yield page dicts for an iterable of doc ids (used by both the Spark
    mapInPandas path and plain-pandas tests)."""
    for i in ids:
        i = int(i)
        cat = _category(i)
        text, lang = _doc_text(i, seed)
        host = _host_id(i, n_hosts)
        url = f"https://host{host}.example/doc/{i}"
        ts = _BASE_TS + datetime.timedelta(seconds=i)
        yield {
            "url": url,
            "warc_ts": ts,
            "html": render_html(text, f"doc {i}"),
            "text": text,
            "lang": lang,
            "expected_keep": cat in _KEEP,
            "expected_reason": _reason(cat),
            "expected_scrubbed_text": reference_scrub(text),
        }


def generate_pages(spark, n: int, seed: int = 42, n_hosts: int | None = None,
                   partitions: int | None = None):
    """Distributed deterministic page table: spark.range -> mapInPandas."""
    import pandas as pd

    n_hosts = n_hosts or max(20, n // 50)

    def gen(batches):
        for pdf in batches:
            rows = list(generate_rows(pdf["id"].tolist(), seed=seed, n_hosts=n_hosts))
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"]).dt.tz_localize(None)
            yield out

    if partitions is None:
        # at least one split per core: downstream stages inherit this
        # partitioning, so under-splitting starves the executor pool
        partitions = max(spark.sparkContext.defaultParallelism, n // 50_000)
    rng = spark.range(0, n, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=PAGES_WITH_LABELS_SCHEMA)
