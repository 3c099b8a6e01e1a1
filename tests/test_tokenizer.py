"""BPE tokenizer training (operators/tokenizer.py): the distributed
merge-step vs its DuckDB oracle, and the k-merge trainer vs a
pure-Python reference BPE on the same word frequencies."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from resin_spark.io import load_tables
from resin_spark.operators import tokenizer as tok
from tests.oracle_util import compare

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016) with the module's exact
    tie-break: max count, then (left, right) ascending."""
    vocab = {tuple(list(w) + [tok.END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merge_step_oracle(spark):
    t = load_tables(spark, SF)
    compare(tok.bpe_merge_step(t), tok.bpe_merge_step_oracle(), SF)


def test_symbols_no_trailing_empty(spark):
    """split must not leave a trailing '' symbol (Spark's limit=-1
    regex-split edge) — a phantom symbol would corrupt every pair count."""
    df = spark.createDataFrame([("abc",), ("a",)], "word string")
    rows = {tuple(r["s"]) for r in
            df.select(tok._symbols(F.col("word")).alias("s")).collect()}
    assert rows == {("a", "b", "c", tok.END), ("a", tok.END)}


@pytest.mark.full_suite
def test_bpe_train_matches_reference(spark):
    """20 merges on the sf0.001 corpus must equal textbook BPE run on
    the identical word-frequency table — via BOTH routes: the gated
    driver-side incremental trainer (default) and the forced
    fully-distributed loop (driver_gate=0)."""
    t = load_tables(spark, SF)
    wc = {r["word"]: r["wf"] for r in tok.word_frequencies(t).collect()}
    expected = _reference_bpe(wc, 20)
    assert tok.bpe_train(t, n_merges=20) == expected
    assert tok.bpe_train(t, n_merges=20, driver_gate=0) == expected


def test_bpe_train_driver_deep_merge_run(spark):
    """The gated route exists to make deep vocabularies cheap: 300
    merges must run in one corpus job + one collect, and its prefix
    must equal a shallower run (BPE merges are prefix-stable)."""
    t = load_tables(spark, SF)
    deep = tok.bpe_train(t, n_merges=300)
    shallow = tok.bpe_train(t, n_merges=20)
    assert deep[:20] == shallow
    assert len(deep) == 300 or len(deep) < 300  # exhausts gracefully


def test_bpe_train_exhausts_gracefully(spark):
    """More merges than fusable pairs: trainer stops when every word is
    a single symbol (pair stream only carries (word, END) singletons
    forever — but those still count, so we just check it returns the
    requested number or fewer, deterministically)."""
    docs = spark.createDataFrame([(0, "ab ab ab cd")],
                                 "doc_id long, text string")
    m1 = tok.bpe_train({"documents": docs}, n_merges=50)
    m2 = tok.bpe_train({"documents": docs}, n_merges=50)
    assert m1 == m2
    assert ("a", "b") == m1[0]


def test_bpe_encode_agrees_with_sequential_merges(spark):
    """Priority-ranked encoding (bpe_encode's word UDF) must equal
    applying the learned merges sequentially in training order — the
    equivalence production BPE encoders rely on. One word per doc so
    the per-doc output IS the per-word encoding."""
    t = load_tables(spark, SF)
    merges = tok.bpe_train(t, n_merges=30)
    words = sorted(
        r["word"] for r in tok.word_frequencies(t).collect())[:200]

    def seq_apply(w):
        syms = list(w) + [tok.END]
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return "|".join(syms)

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           tok.bpe_encode({"documents": docs}, merges).collect()}
    for i, w in enumerate(words):
        exp = seq_apply(w)
        assert got[i]["subword_text"] == exp, (w, got[i]["subword_text"], exp)
        assert got[i]["n_subwords"] == exp.count("|") + 1
        assert got[i]["n_words"] == 1


def test_bpe_train_and_encode_degenerate_corpora(spark):
    """No [a-z]+ words (numeric/unicode-only corpus) and fully-empty
    corpora must train zero merges and encode zero rows — not crash in
    the pair explode or the Arrow encoder."""
    for rows in ([], [(1, "123 456 !!!"), (2, "日本語 テキスト"), (3, None)]):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        merges = tok.bpe_train({"documents": docs}, n_merges=5)
        assert merges == []
        assert tok.bpe_encode({"documents": docs}, merges).count() == 0
        # distributed route agrees
        assert tok.bpe_train({"documents": docs}, n_merges=5,
                             driver_gate=0) == []


def test_bpe_encode_subword_text_is_position_ordered(spark):
    """r6: subword_text must concatenate encodings in ORIGINAL token
    order (the collect_list nondeterminism fix) — pinned on a doc whose
    sorted-word order differs from its text order."""
    docs = spark.createDataFrame(
        [(1, "zebra apple zebra mango")], "doc_id long, text string")
    out = tok.bpe_encode({"documents": docs}, []).collect()
    assert len(out) == 1
    txt = out[0]["subword_text"]
    words = [w.replace("|", "") .replace("</w>", "")
             for w in txt.split(" ")]
    assert words == ["zebra", "apple", "zebra", "mango"]


@pytest.mark.full_suite
def test_bpe_encode_oracle_property_random_corpora(spark):
    """Cross-engine property for the r6 driver oracle: on adversarial
    small corpora (alphabet {a,b} → heavy repeats, overlapping pair
    occurrences, words that are prefixes of each other), the engine's
    train→encode must hash-equal the unrolled-CTE DuckDB oracle that
    retrains the merges via the bracket-string replace trick. Driven
    by hypothesis over random corpora and merge counts."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=0, max_size=6), min_size=1, max_size=6)

    @given(corpus, st.integers(1, 6))
    @settings(max_examples=12, deadline=None)
    def run(doc_words, n_merges):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        t = {"documents": docs}
        merges = tok.bpe_train(t, n_merges=n_merges)
        got = sorted(
            (r["doc_id"], r["n_words"], r["n_subwords"], r["subword_text"])
            for r in tok.bpe_encode(t, merges).collect())

        con = duckdb.connect()
        con.register("documents_src", __import__("pandas").DataFrame(
            rows, columns=["doc_id", "text"]))
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
        want = sorted(map(tuple, con.execute(
            tok.bpe_encode_oracle(n_merges)).fetchall()))
        con.close()
        assert got == want, (rows, n_merges, merges)

    run()
