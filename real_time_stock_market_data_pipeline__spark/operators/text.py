"""Text-analysis operators over document tables — the north-star
LLM-training-data surface (SURVEY.md §2.10; no reference counterpart).

Everything is built-in column expressions (JVM-side, codegen-friendly)
with deliberately engine-portable semantics: simple explicit character
classes instead of locale/engine-dependent ones, exact decimal ratios,
and md5-based fingerprints — so every operator has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators.dedup import (
    normalized_text,
)
from real_time_stock_market_data_pipeline__spark.session import (
    ensure_min_parallelism,
)

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic. Order matters: argmax ties resolve in this
#: fixed order (en → es → fr → de → zh).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有", "不"],
}

#: Explicit punctuation class — identical bytes in Java and RE2 regex.
PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"

#: BPE-ish pre-tokenizer: letter runs, digit runs, single
#: non-alphanumeric non-space marks.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_EN_STOPWORDS = LANG_PROFILES["en"] + ["a", "it", "for", "on", "with", "as"]


def _toks(text_col: str) -> F.Column:
    return F.split(normalized_text(text_col), " ")


def text_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features: char/word counts, average word
    length, punctuation & digit & stopword ratios, and a composite
    quality score in [0,1]. All ratios are single IEEE divisions of
    integer counts — bit-identical in any engine."""
    toks = _toks(text_col)
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS))
    )
    word_chars = F.length(F.regexp_replace(normalized_text(text_col), " ", ""))
    avg_word_len = F.when(n_words > 0, word_chars / n_words)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    # crude composite: long-enough docs with some stopwords and little
    # digit/punct noise score high
    quality = (
        F.least(n_words / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * 4, F.lit(1.0)) * F.lit(0.3)
        + (1 - F.least(digit_ratio * 5, F.lit(1.0))) * F.lit(0.15)
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * F.lit(0.15)
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


def token_count(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (letter runs,
    digit runs, punctuation marks) — the cheap pre-tokenizer estimate a
    training pipeline uses for budget accounting."""
    return docs.select(
        F.col(id_col),
        F.size(_toks(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)).alias(
            "bpe_tokens"
        ),
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-profile language ID: count hits per language profile,
    argmax with fixed tie order. Heuristic by design (SURVEY §2.10
    'language-ID (n-gram heuristic)'); returns NULL when no profile
    matches at all."""
    toks = _toks(text_col)

    # single-arg closure, NOT `lambda t, ws=...:` — a two-parameter
    # lambda makes transform/filter pass the element index as the
    # second argument (see operators.dedup.minhash_signature)
    def _hits(words: list[str]):
        return lambda t: t.isin(*words)

    scores = {
        lang: F.size(F.filter(toks, _hits(words)))
        for lang, words in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    best = F.lit(None).cast("string")
    # build argmax right-to-left so earlier languages win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        best.alias("lang_pred"),
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", gram: int = 8
) -> DataFrame:
    """Rolling-hash document fingerprint: minimum md5 over all
    character ``gram``-grams of the normalized text (a 1-permutation
    MinHash over character shingles — robust to word reordering at the
    edges, cheap, and portable). Documents shorter than ``gram`` chars
    fall back to the md5 of the whole normalized text."""
    # One md5 per character position: a transform(...) higher-order
    # function would evaluate every hash interpreted (HOFs never enter
    # whole-stage codegen — measured 62s→1.7s on the analogous MinHash
    # restructure). Instead explode the positions to rows, hash with
    # plain codegen expressions, and take min() — a map-side partial
    # aggregate, so the shuffle carries one 32-char row per document.
    # Position 0 is the short-document sentinel (md5 of the whole text).
    norm_df = ensure_min_parallelism(docs).select(
        F.col(id_col), normalized_text(text_col).alias("__norm")
    )
    n = F.length("__norm") - F.lit(gram - 1)
    pos = F.explode(
        F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(F.array(F.lit(0)))
    )
    exploded = norm_df.select(F.col(id_col), F.col("__norm"), pos.alias("i"))
    h = F.when(
        F.col("i") > 0,
        F.md5(F.substring(F.col("__norm"), F.col("i"), F.lit(gram))),
    ).otherwise(F.md5(F.col("__norm")))
    return (
        exploded.select(F.col(id_col), h.alias("__h"))
        .groupBy(id_col)
        .agg(F.min("__h").alias("fingerprint"))
    )


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus term statistics: term frequency (total occurrences) and
    document frequency per normalized token — the tokenize → explode →
    groupBy aggregation SURVEY §2.10 names, and the building block for
    tf-idf / vocabulary pruning in a training-data pipeline.

    Scale: explode keeps rows in their input partition; the groupBy
    partially aggregates tf map-side. df (count distinct doc ids per
    term) shuffles (term, doc_id) pairs once — for web-scale corpora
    swap in approx_count_distinct to shuffle constant-size HLL sketches
    instead.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_toks(text_col)).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the training/RAG preparation step (context packing, embedding
    units). Chunk *i* covers ``[i·stride, i·stride + chunk_chars)``
    with ``stride = chunk_chars - overlap``; documents at most
    ``chunk_chars`` long yield one chunk.

    Pure integer arithmetic + substring: deterministic, engine-
    portable, and SQL-oracle-checkable. Scale: explode stays in the
    input partition (no shuffle); expansion factor ≈ len/stride is
    bounded by construction.
    """
    if overlap >= chunk_chars:
        raise ValueError("chunk_documents: overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col))
    # integer chunk count: (len - overlap + stride - 1) // stride
    n_chunks = F.when(ln <= chunk_chars, F.lit(1)).otherwise(
        F.floor((ln - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride))
    )
    exploded = docs.select(
        F.col(id_col),
        F.col(text_col),
        n_chunks.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.substring(
            F.col(text_col),
            (F.col("chunk_idx") * stride + 1).cast("int"),
            chunk_chars,
        ).alias("chunk_text"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
    )
