"""Embedded deterministic lexicons: stopwords, content words, toxicity list.

Everything here is a plain literal so every stage (generator, langid,
heuristics, scrub) is a pure function with no external model files —
the "climatology lookup table" pattern of the reference
(reference src/range_check.cpp:95-110: constants embedded in code).

A real deployment swaps `TOXICITY_LEXICON` for a curated list and the
langid profiles for fastText (see titanlib_spark.webtext.langid); the
Spark-side plumbing is identical.
"""

from __future__ import annotations

# --- stopword profiles (the langid feature set) -------------------------
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
        "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
        "have", "from", "or", "had", "by", "not", "but", "what", "were", "we",
    ),
    "de": (
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch",
        "es", "an", "werden", "aus", "er", "hat", "dass", "sie", "nach", "wird",
    ),
    "fr": (
        "le", "de", "un", "etre", "et", "a", "il", "avoir", "ne", "je",
        "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au",
        "pour", "pas", "sur", "faire", "plus", "dire", "vous", "par", "est", "les",
    ),
    "es": (
        "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
        "las", "por", "un", "para", "con", "no", "una", "su", "al", "lo",
        "como", "mas", "pero", "sus", "le", "ya", "o", "este", "si", "porque",
    ),
}

# --- content vocabulary per language (generator sampling pools) ---------
CONTENT_WORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "data", "quality", "pipeline", "document", "filter", "language",
        "model", "spark", "table", "partition", "cluster", "check", "value",
        "score", "text", "page", "host", "batch", "window", "result",
        "system", "process", "record", "stream", "index", "query", "engine",
        "network", "station", "weather", "report", "analysis", "method",
    ),
    "de": (
        "daten", "pipeline", "dokument", "sprache", "modell", "tabelle",
        "wert", "seite", "system", "prozess", "bericht", "analyse", "methode",
        "qualitaet", "ergebnis", "netzwerk", "station", "wetter", "zeit",
    ),
    "fr": (
        "donnees", "document", "langue", "modele", "valeur", "page",
        "systeme", "processus", "rapport", "analyse", "methode", "qualite",
        "resultat", "reseau", "station", "temps", "moteur", "requete",
    ),
    "es": (
        "datos", "documento", "lengua", "modelo", "valor", "pagina",
        "sistema", "proceso", "informe", "analisis", "metodo", "calidad",
        "resultado", "red", "estacion", "tiempo", "motor", "consulta",
    ),
}

# Fictional profanities (Battlestar/Red-Dwarf-style) so the synthetic corpus
# stays inoffensive; swap for a real curated lexicon in deployment.
TOXICITY_LEXICON: tuple[str, ...] = ("frak", "gorram", "smeg", "felgercarb", "dren")

LANGS: tuple[str, ...] = tuple(STOPWORDS.keys())
