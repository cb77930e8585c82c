"""Gopher / C4 quality-ruleset semantics on realistic punctuated text —
the registered queries run on the punctuation-free synthetic corpus, so
the rule edges (bullets, ellipses, terminal punctuation, lorem ipsum)
are pinned here."""

from __future__ import annotations

from weatherdatapipeline_spark.operators.quality import (
    c4_line_filter,
    gopher_quality_flags,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and that is fine "
    "to be said of a fox with plenty of words to have here and more "
    "words again so the count clears fifty easily with all of the "
    "stop words present and a healthy mean word length throughout "
    "because every token is an ordinary english word of normal size."
)


def test_gopher_passes_clean_document(spark):
    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    row = gopher_quality_flags(df).collect()[0]
    assert row["passes"] is True
    assert row["n_words"] >= 50
    assert 3.0 <= row["mean_word_len"] <= 10.0
    assert row["stopword_hits"] >= 2


def test_gopher_individual_rules(spark):
    rows = [
        (1, "too short"),  # word count
        (2, " ".join(["####"] * 60)),  # symbol ratio + no stopwords + no alpha
        (3, "\n".join(["- bullet item with some words"] * 10)),  # bullets
        (4, "\n".join(["this line trails off with more..."] * 10)),  # ellipses
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[1]["ok_word_count"] is False
    assert got[2]["ok_symbol_ratio"] is False
    assert got[2]["ok_alpha_words"] is False
    assert got[2]["ok_stopwords"] is False
    assert got[3]["ok_bullet_lines"] is False
    assert got[4]["ok_ellipsis_lines"] is False
    assert all(got[i]["passes"] is False for i in (1, 2, 3, 4))


def test_c4_line_filter_semantics(spark):
    text = "\n".join(
        [
            "This sentence ends with terminal punctuation and is long enough.",
            "short line.",  # < 5 words: dropped
            "no terminal punctuation on this line at all",  # dropped
            "Does a question mark count as terminal punctuation here?",
            'He said "it ends with a quote after the period."',
        ]
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = c4_line_filter(df).collect()[0]
    assert row["n_lines"] == 5
    assert row["n_kept_lines"] == 3
    kept = row["text_clean"].split("\n")
    assert kept[0].startswith("This sentence") and kept[1].startswith("Does a")
    assert row["has_lorem_ipsum"] is False
    assert row["ok_min_sentences"] is True  # 4 terminal marks


def test_c4_page_flags(spark):
    rows = [
        (0, "Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
        (1, "function f() { return 1; } is javascript junk."),
        (2, "One sentence only here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert got[0]["has_lorem_ipsum"] is True
    assert got[1]["has_curly_brace"] is True
    assert got[2]["ok_min_sentences"] is False


def test_gopher_repetition_metrics(spark):
    """Planted repetition: a doc that is one 5-gram repeated 4 times has
    dup_5gram_char_frac near 1.0 (capped); a duplicate line shows in the
    line fractions; a no-repeat doc scores 0 everywhere."""
    from weatherdatapipeline_spark.operators.quality import gopher_repetition_flags

    phrase = "alpha beta gamma delta epsilon"
    rows = [
        (0, " ".join([phrase] * 4)),                       # heavy 5-gram repetition
        (1, "dup line\ndup line\nfresh line"),             # duplicate line
        (2, "each word here appears exactly once in this"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}
    assert got[0]["dup_5gram_char_frac"] == 1.0  # capped
    assert got[0]["top_2gram_char_frac"] > 0.2
    assert got[1]["dup_line_frac"] == round(1 / 3, 6)
    assert got[1]["dup_line_char_frac"] > 0.3
    r2 = got[2]
    # no repeated anything: every dup_ metric is exactly 0; top_ metrics
    # are nonzero by definition (tf=1 grams still have a maximum)
    assert all(r2[c] == 0.0 for c in r2.asDict() if c.startswith("dup_"))
    assert 0 < r2["top_2gram_char_frac"] < 0.5
