"""BPE trainer/encoder vs a pure-Python replay of the identical
algorithm (Sennrich 2016 greedy merge, lexicographic tiebreak) — the
correctness pin for the rows-only `bpe_learned_merges` driver entry."""

from __future__ import annotations

from collections import Counter

from weatherdatapipeline_spark.operators import bpe as B


def ref_bpe(word_counts: dict[str, int], n_merges: int):
    """~20-line reference implementation over the same word counts."""
    vocab = {w: list(w) + [B.END_OF_WORD] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_matches_reference_on_synthetic_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
    ]
    docs = _docs(spark, texts)
    wc = Counter(w for t in texts for w in t.lower().split())
    expect, _ = ref_bpe(dict(wc), 8)
    got = B.bpe_train(docs, n_merges=8)
    assert got == expect


def test_bpe_matches_reference_on_real_corpus(spark, sf_dir):
    from weatherdatapipeline_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    wc = {
        r["word"]: r["cnt"] for r in B.word_counts(docs).collect()
    }
    expect, _ = ref_bpe(wc, 6)
    got = B.bpe_train(docs, n_merges=6)
    assert got == expect


def test_bpe_stops_early_when_no_pairs_remain(spark):
    # single-char words: after ('a','</w>') etc. merge, nothing adjacent
    docs = _docs(spark, ["a a a", "b b"])
    got = B.bpe_train(docs, n_merges=50)
    wc = {"a": 3, "b": 2}
    expect, _ = ref_bpe(wc, 50)
    assert got == expect
    assert len(got) < 50  # genuinely stopped early


def test_bpe_tiebreak_is_lexicographic(spark):
    # 'ab' and 'cd' pairs tie at count 2 -> ('a','b') wins the first rank
    docs = _docs(spark, ["ab ab cd cd"])
    got = B.bpe_train(docs, n_merges=1)
    assert got[0][1:3] == ("a", "b")


def test_bpe_encode_matches_trained_final_state(spark):
    texts = ["low low lower newest", "newest widest low"]
    docs = _docs(spark, texts)
    wc = Counter(w for t in texts for w in t.lower().split())
    merges = B.bpe_train(docs, n_merges=6)
    _, final_vocab = ref_bpe(dict(wc), 6)
    words = B.word_counts(docs)
    enc = {r["word"]: list(r["tokens"]) for r in B.bpe_encode_words(words, merges).collect()}
    assert enc == final_vocab
