"""Document-quality rulesets for pretraining-corpus curation.

Two published filter families, re-expressed as single map-only JVM
projections (no Python UDFs, no shuffle — they pipeline with the scan):

- ``gopher_quality_flags``: the Gopher paper's document-level quality
  rules (Rae et al., "Scaling Language Models: ... Gopher", 2021,
  App. A1.1): word count, mean word length, symbol-to-word ratio,
  bullet/ellipsis line fractions, alphabetic-word fraction, stop-word
  presence.
- ``c4_line_filter``: the C4 cleaning pass (Raffel et al., "Exploring
  the Limits of Transfer Learning...", 2020, §2.2): keep lines that end
  in terminal punctuation AND have >= 5 words; page-level flags for
  "lorem ipsum", curly braces (JS), and the 3-sentence minimum.

Every expression stays in the RE2/Java-regex common subset so the DuckDB
oracle can run the literal same logic; fractions are rounded to 6 so the
differential hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import spread

# Gopher App. A1.1 stop words ("must contain at least 2")
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule metrics, one boolean per rule, and the
    conjunction ``passes`` — thresholds default to the paper's. Metrics
    are emitted (not just the verdict) so downstream mixture tuning can
    re-threshold without a second scan."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    # total non-whitespace chars / words (the paper's mean word length)
    mean_wl = F.length(F.regexp_replace(text, r"\s+", "")) / n_words
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.")) - 1
    symbol_ratio = (n_hash + n_ellipsis) / n_words
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ) / n_lines
    ellipsis_frac = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))) / n_lines
    alpha_frac = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio < max_symbol_ratio,
        "ok_bullet_lines": bullet_frac < max_bullet_frac,
        "ok_ellipsis_lines": ellipsis_frac < max_ellipsis_frac,
        "ok_alpha_words": alpha_frac >= min_alpha_frac,
        "ok_stopwords": stop_hits >= min_stop_hits,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    # deliberately NOT spread(): the zero-Exchange map-only plan is this
    # operator's audited contract (it pipelines with the scan at scale);
    # the regex battery is cheap enough that the 1-task toy-scale case
    # does not justify trading the contract away
    return documents.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        *[v.alias(k) for k, v in flags.items()],
        passes.alias("passes"),
    )


def c4_line_filter(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning: a line survives iff it ends in terminal punctuation
    (. ! ? or closing quote after one) AND has >= ``min_words_per_line``
    words. Page-level columns flag "lorem ipsum", curly braces, and the
    ``min_sentences`` minimum (counted as terminal-punct occurrences over
    the whole page, the C4 proxy). Returns the filtered text plus counts
    so callers can apply the page-level drops themselves.

    Note: on punctuation-free synthetic corpora every line fails the
    terminal-punct rule by design — tests/test_quality.py covers the
    semantics on realistic punctuated text."""
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    terminal = r'[.!?]["”\']?\s*$'
    kept = F.filter(
        lines,
        lambda l: l.rlike(terminal)
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line),
    )
    n_sentences = F.size(F.split(text, r"[.!?]")) - 1
    # NOT spread(): same zero-Exchange contract as gopher_quality_flags
    return documents.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("text_clean"),
        F.lower(text).contains("lorem ipsum").alias("has_lorem_ipsum"),
        text.contains("{").alias("has_curly_brace"),
        n_sentences.cast("long").alias("n_sentences"),
        (n_sentences >= min_sentences).alias("ok_min_sentences"),
    )


def gopher_repetition_flags(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher REPETITION metric suite (Rae et al. 2021, App. A1.1):
    per-document duplicate-line fraction and char fraction, fraction of
    characters in the most frequent {2,3,4}-gram, and fraction of
    characters in duplicated {5..10}-grams.

    Char accounting convention: every occurrence of a qualifying gram
    contributes tf * len(gram) characters, capped at 1.0 — the paper
    de-overlaps occurrences; this simpler convention is monotone in the
    same signal and is recomputed identically by the DuckDB oracle.

    Shape: line metrics are per-row array HOFs (no shuffle); the n-gram
    metrics build ALL nine gram sizes from ONE token explode + nine
    lead() windows over the same doc partition, then one (doc, n, gram)
    tf aggregate and a doc-level pivot — two shuffles total on doc-id
    keys, independent of how many gram sizes are measured."""
    from pyspark.sql import Window

    text = F.col(text_col)
    lines = F.split(text, r"\n")
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, x: a + x
    )
    dist_chars = F.aggregate(
        F.transform(F.array_distinct(lines), F.length), F.lit(0), lambda a, x: a + x
    )
    documents = spread(documents, id_col)
    line_stats = documents.select(
        F.col(id_col),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(line_chars > 0, (line_chars - dist_chars) / line_chars).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("dup_line_char_frac"),
    )
    tok = documents.select(
        F.col(id_col),
        F.length(text).alias("_nc"),
        F.posexplode(F.split(F.lower(F.trim(text)), r"\s+")).alias("pos", "tk"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = {j: F.lead("tk", j).over(w) for j in range(1, 10)}
    with_grams = tok.select(
        F.col(id_col),
        "_nc",
        "pos",
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("_ntok"),
        *[
            F.concat_ws(" ", F.col("tk"), *[leads[j] for j in range(1, n)]).alias(
                f"g{n}"
            )
            for n in range(2, 11)
        ],
    )
    stacked = (
        with_grams.select(
            F.col(id_col),
            "_nc",
            "pos",
            "_ntok",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("n"), F.col(f"g{n}").alias("gram")
                        )
                        for n in range(2, 11)
                    ]
                )
            ).alias("s"),
        )
        .select(id_col, "_nc", "pos", "_ntok", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
        .filter(F.col("pos") <= F.col("_ntok") - F.col("n"))
    )
    tf = stacked.groupBy(id_col, "_nc", "n", "gram").agg(
        F.count(F.lit(1)).alias("tf")
    )
    per_n = tf.groupBy(id_col, "_nc", "n").agg(
        F.max(F.col("tf") * F.length("gram")).alias("top_chars"),
        F.sum(F.when(F.col("tf") >= 2, F.col("tf") * F.length("gram"))).alias(
            "dup_chars"
        ),
    )
    piv = per_n.groupBy(id_col, "_nc").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"_top{n}")
            for n in (2, 3, 4)
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"_dup{n}")
            for n in range(5, 11)
        ],
    )
    frac_cols = [
        F.round(
            F.coalesce(F.col(f"_top{n}") / F.col("_nc"), F.lit(0.0)), 6
        ).alias(f"top_{n}gram_char_frac")
        for n in (2, 3, 4)
    ] + [
        # coalesce BEFORE least: least() skips NULLs in both engines, so
        # least(NULL, 1.0) would turn "no duplicate grams" into 1.0
        F.round(
            F.least(
                F.coalesce(F.col(f"_dup{n}") / F.col("_nc"), F.lit(0.0)), F.lit(1.0)
            ),
            6,
        ).alias(f"dup_{n}gram_char_frac")
        for n in range(5, 11)
    ]
    piv = piv.select(F.col(id_col), *frac_cols)
    out_cols = [c for c in piv.columns if c != id_col]
    return line_stats.join(piv, id_col, "left").select(
        F.col(id_col),
        "dup_line_frac",
        "dup_line_char_frac",
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in out_cols],
    )


def validate_and_route(
    documents: DataFrame,
    min_chars: int = 100,
    allowed_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Schema/content validation with dead-letter routing: every rule
    evaluates independently and a failing row carries ALL its failure
    reasons (the quarantine-queue contract — one pass tells the producer
    everything wrong with a record, not just the first rule hit).

    Pure map-only JVM expressions (array of CASE tags + array filter),
    zero Exchange — the quarantine split pipelines with the scan at any
    scale. Returns only the quarantined rows: (id, lang, n_chars,
    reasons csv, n_reasons); the clean side is the complement filter.
    """
    n_toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    tags = F.array(
        F.when(F.col("n_chars") < min_chars, F.lit("too_short")),
        F.when(~F.col("lang").isin(*allowed_langs), F.lit("unsupported_lang")),
        F.when(n_toks < min_tokens, F.lit("too_few_tokens")),
    )
    reasons = F.filter(tags, lambda x: x.isNotNull())
    return (
        documents.withColumn("_r", reasons)
        .filter(F.size("_r") > 0)
        .select(
            id_col,
            "lang",
            "n_chars",
            F.array_join("_r", ",").alias("reasons"),
            F.size("_r").cast("bigint").alias("n_reasons"),
        )
    )
