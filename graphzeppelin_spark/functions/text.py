"""Text-analysis functions for training-data pipelines — all pure Catalyst
expressions (JVM-side, codegen'd, no Python), so a DuckDB oracle can compute
the identical ANSI-SQL formula.

- language-ID: marker-word scoring heuristic (deterministic; a production
  system would swap in fastText behind the same column contract);
- quality scoring: length/punctuation/stopword ratios combined;
- token counting: whitespace tokens and a BPE-ish subword estimate
  (word-count + ceil(chars/4) blend — the standard cheap token estimator);
- fingerprinting: md5 over whitespace-normalized lowercase text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker words per language for the heuristic language-ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of `word` as a whitespace-delimited token (SQL-portable:
    filter the token array — same lambda exists in DuckDB as list_filter)."""
    toks = F.split(F.trim(text), "\\s+")
    return F.size(F.filter(toks, lambda x: x == F.lit(word)))


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Cheap subword-token estimate: max(words, ceil(chars/4)) — the standard
    ~4-chars-per-token heuristic, floored by the word count."""
    return F.greatest(token_count(text), F.ceil(F.length(text) / F.lit(4.0)).cast("long"))


def round_portable(col: Column, digits: int) -> Column:
    """Cross-engine-deterministic rounding: floor(x * 10^d + 0.5) / 10^d.

    Engines disagree on decimal HALF_UP ties over binary doubles (Spark
    rounds the double's shortest decimal repr via BigDecimal; DuckDB rounds
    the double itself — 0.5071125 famously splits them). floor, *, + are
    single exact-or-correctly-rounded IEEE ops, so two engines holding the
    SAME double always produce the same result here. Nonnegative inputs."""
    scale = F.lit(float(10**digits))
    return F.floor(col * scale + F.lit(0.5)) / scale


def punct_ratio(text: Column, digits: int = 6) -> Column:
    """Fraction of characters that are .,!?;: punctuation."""
    removed = F.translate(text, ".,!?;:", "")
    return round_portable(
        (F.length(text) - F.length(removed)) / F.greatest(F.length(text), F.lit(1)),
        digits,
    )


def stopword_ratio(text: Column, digits: int = 6) -> Column:
    total = token_count(text)
    sw = None
    for w in STOPWORDS:
        c = _count_word(F.lower(text), w)
        sw = c if sw is None else sw + c
    return round_portable(sw / F.greatest(total, F.lit(1)), digits)


def quality_score(text: Column, digits: int = 6) -> Column:
    """Blend of signals in [0,1]: longer docs with moderate stopword density
    and low punctuation noise score higher (weights arbitrary but fixed)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(text, digits=9)
    sw_term = F.lit(1.0) - F.abs(sw - F.lit(0.4)) / F.lit(0.4)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text, digits=9) * 10, F.lit(1.0))
    return round_portable(
        0.4 * length_term + 0.3 * F.greatest(sw_term, F.lit(0.0)) + 0.3 * punct_term,
        digits,
    )


def language_id(text: Column) -> Column:
    """Deterministic marker-word language guess; ties break by fixed language
    order (en, de, fr, es, zh); no markers -> 'und'."""
    lowered = F.lower(text)
    scores = {
        lang: sum_cols([_count_word(lowered, w) for w in words])
        for lang, words in LANG_MARKERS.items()
    }
    order = ["en", "de", "fr", "es", "zh"]
    best = F.lit("und")
    best_score = F.lit(0)
    # earlier languages win ties: later ones must strictly exceed to displace
    for lang in order:
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def fingerprint(text: Column) -> Column:
    """md5 of lowercase whitespace-collapsed text — the dedup-normal form."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), "\\s+", " "))


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with every text-analysis signal (the pipeline's
    feature table).

    Factored (round 8): the component functions each re-split the text —
    35+ regex splits per row across stopword/marker counts, and Catalyst's
    subexpression elimination does not fuse duplicated higher-order-function
    trees — so the profile computes the two token arrays ONCE in a first
    projection and expresses every signal over them. Formulas are the
    component functions' verbatim (identical values; the contract oracle
    pins them)."""
    t = F.col(text_col)
    base = docs.select(
        "doc_id",
        t.alias("_t"),
        F.split(F.trim(t), "\\s+").alias("_tk"),
        F.split(F.trim(F.lower(t)), "\\s+").alias("_lt"),
    )
    tt = F.col("_t")

    def cnt(word: str) -> Column:
        return F.size(F.filter(F.col("_lt"), lambda x: x == F.lit(word)))

    ntok = F.when(F.length(F.trim(tt)) == 0, F.lit(0)).otherwise(F.size("_tk"))
    n_subword = F.greatest(ntok, F.ceil(F.length(tt) / F.lit(4.0)).cast("long"))
    removed = F.translate(tt, ".,!?;:", "")
    punct_raw = (F.length(tt) - F.length(removed)) / F.greatest(
        F.length(tt), F.lit(1)
    )
    sw = None
    for w in STOPWORDS:
        c = cnt(w)
        sw = c if sw is None else sw + c
    sw_raw = sw / F.greatest(ntok, F.lit(1))
    # quality_score's formula verbatim, over the factored 9-digit ratios
    length_term = F.least(F.length(tt) / F.lit(500.0), F.lit(1.0))
    sw9 = round_portable(sw_raw, 9)
    sw_term = F.lit(1.0) - F.abs(sw9 - F.lit(0.4)) / F.lit(0.4)
    punct_term = F.lit(1.0) - F.least(round_portable(punct_raw, 9) * 10, F.lit(1.0))
    quality = round_portable(
        0.4 * length_term + 0.3 * F.greatest(sw_term, F.lit(0.0)) + 0.3 * punct_term,
        6,
    )
    # language_id's tie-break loop verbatim, over the factored counts
    scores = {
        lang: sum_cols([cnt(w) for w in words])
        for lang, words in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in ["en", "de", "fr", "es", "zh"]:
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return base.select(
        "doc_id",
        ntok.alias("n_tokens"),
        n_subword.alias("n_subword_tokens"),
        round_portable(punct_raw, 6).alias("punct_ratio"),
        round_portable(sw_raw, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        best.alias("lang_pred"),
        F.md5(F.regexp_replace(F.trim(F.lower(tt)), "\\s+", " ")).alias(
            "fingerprint"
        ),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) winnowing document fingerprints (Schleimer/Wilkerson/
    Aiken, SIGMOD'03): hash every k-gram of the normalized text with a
    rolling window position, keep the MINIMUM hash of each window of w
    consecutive k-gram hashes, emit the distinct minima. Two documents
    sharing any sufficiently long substring share fingerprints — the
    plagiarism/near-dup detection primitive that md5-of-whole-text cannot
    give.

    100% Catalyst: the k-gram hash is md5-derived (first 15 hex chars as a
    60-bit integer, same arithmetic an independent SQL engine reproduces —
    see the text_winnow oracle), windows are array slices of the hash
    sequence. Cost is O(len * w) expression work per doc — fine for
    fingerprint-sized documents; a corpus of multi-MB blobs would move the
    same algebra into a numpy mapInPandas with an O(len) deque minimum.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    # k-gram rolling hashes h[i], i = 1..len-k+1, over the normalized column
    hashes = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring(_norm, i, {k})), 1, 15), 16, 10) as bigint))"
    )
    # window minima: min(h[i..i+w-1]) for each window start
    fps = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(kgram_hashes) - {w - 1}, 1)),"
        f" i -> array_min(slice(kgram_hashes, i, {w}))))"
    )
    return (
        docs.select("doc_id", norm.alias("_norm"))
        .select("doc_id", hashes.alias("kgram_hashes"))
        .select("doc_id", F.explode(fps).alias("fp"))
    )


def winnowing_fingerprints_large(
    docs: DataFrame, k: int = 5, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) winnowing fingerprints for LARGE documents — the numpy
    scale path the Catalyst variant's docstring names: the O(len * w)
    per-row expression algebra becomes one vectorized pass per document
    inside an Arrow-batched mapInPandas.

    Same algorithm (normalize → k-gram hash → window-of-w minima → distinct),
    different hash: a base-257 polynomial over the utf-8 bytes finalized with
    splitmix64 (vectorized; md5-per-gram would put a Python hashlib call in
    the per-gram loop). Fingerprints are therefore NOT interchangeable with
    winnowing_fingerprints' md5-derived ones — pick one variant per corpus;
    the winnowing guarantee (shared substrings of length >= w + k - 1 share
    a fingerprint) holds identically, tested in test_pipeline_ops."""
    import re as _re

    import numpy as np
    import pandas as pd

    from graphzeppelin_spark.sketch.kernel import splitmix64

    B = np.uint64(257)
    ws_re = _re.compile(r"\s+")

    def _fps_one(text: str) -> np.ndarray:
        norm = ws_re.sub(" ", text.strip().lower())
        b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            b = np.pad(b, (0, k - len(b)))  # mirror the SQL greatest(.., 1)
        n_grams = len(b) - k + 1
        h = np.zeros(n_grams, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):  # k vectorized adds, not a per-gram loop
                h = h * B + b[j : j + n_grams].astype(np.uint64)
        h = splitmix64(h, 0)
        if len(h) >= w:
            mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        else:
            mins = h.min(keepdims=True)
        return np.unique(mins)

    def _run(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                u = _fps_one(text or "")
                ids.append(np.full(len(u), did, dtype=np.int64))
                fps.append(u.view(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else np.array([], np.int64),
                    "fp": np.concatenate(fps) if fps else np.array([], np.int64),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(_run, schema="doc_id long, fp long")
