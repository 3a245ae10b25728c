"""Subword tokenizer: trainer parity (Spark fit vs golden artifact),
the no-migration property (VERDICT r7 #3's done-criterion), greedy
longest-match semantics, UNK handling, artifact round-trip."""

import os

import pytest

from hgt2osm2_spark.ops import tokenizer as tk

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_DIR = os.path.join(REPO, "golden", "tokenizer_model")
SF01 = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF01, "documents.parquet"))


def test_spark_fit_equals_golden_artifact(spark):
    """The ann_model trainer contract: one Spark groupBy word count +
    the shared BPE core must reproduce the artifact the golden trainer
    (pandas counting + same core) persisted — bit-identical pieces."""
    from tools.make_golden import TOKENIZER_PARAMS

    fitted = tk.fit_tokenizer(_docs(spark), **TOKENIZER_PARAMS)
    stored = tk.load_tokenizer(MODEL_DIR)
    assert fitted.pieces == stored.pieces


def test_no_migration_on_vocab_growth(spark):
    """Refitting with a LARGER vocab_size must (a) keep the old pieces
    at the old ids (BPE merges are prefix-stable), and (b) change the
    tokenization of ONLY the documents that contain a new piece."""
    from tools.make_golden import TOKENIZER_PARAMS

    small = tk.load_tokenizer(MODEL_DIR)
    params = dict(TOKENIZER_PARAMS)
    params["vocab_size"] = params["vocab_size"] + 8
    big = tk.fit_tokenizer(_docs(spark), **params)
    n_old = len(small.pieces)
    assert big.pieces[:n_old] == small.pieces
    assert len(big.pieces) > n_old
    new_pieces = set(big.pieces[n_old:])

    docs = _docs(spark)
    a = {r["doc_id"]: r["token_ids"]
         for r in tk.subword_tokens(docs, small).collect()}
    b = {r["doc_id"]: r["token_ids"]
         for r in tk.subword_tokens(docs, big).collect()}
    assert set(a) == set(b)
    changed = [d for d in a if a[d] != b[d]]
    assert changed, "vocab growth changed nothing - test shape too weak"
    boundary = n_old + tk.N_SPECIALS
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d in changed:
        assert any(t >= boundary for t in b[d]), (
            "changed doc uses no new piece id")
    # unchanged docs must not contain any word that NOW encodes
    # differently — verify via the scalar encoder
    for d in set(a) - set(changed):
        assert a[d] == b[d]
        for wd in tk.split_words(texts[d]):
            e_small = tk.encode_word(
                wd, small.init_vocab, small.cont_vocab, small.max_piece_len)
            e_big = tk.encode_word(
                wd, big.init_vocab, big.cont_vocab, big.max_piece_len)
            assert e_small == e_big


def test_extend_tokenizer_appends_only():
    m = tk.load_tokenizer(MODEL_DIR)
    m2 = tk.extend_tokenizer(m, [("zzz", False), m.pieces[0]])
    assert m2.pieces[: len(m.pieces)] == m.pieces
    assert m2.pieces[-1] == ("zzz", False)
    assert len(m2.pieces) == len(m.pieces) + 1  # duplicate not re-added


def test_greedy_longest_match_semantics():
    pieces = (("ab", False), ("a", False), ("b", True), ("c", True),
              ("bc", True), ("abc", False))
    m = tk.TokenizerModel(pieces)
    ids = {p: i + tk.N_SPECIALS for i, p in enumerate(pieces)}

    def enc(w):
        return tk.encode_word(w, m.init_vocab, m.cont_vocab, m.max_piece_len)

    assert enc("abc") == [ids[("abc", False)]]          # longest wins
    assert enc("abbc") == [ids[("ab", False)], ids[("bc", True)]]
    assert enc("ab") == [ids[("ab", False)]]
    assert enc("ac") == [ids[("a", False)], ids[("c", True)]]
    assert enc("ba") == [tk.UNK_ID]   # no word-initial 'b' piece
    assert enc("abd") == [tk.UNK_ID]  # unmatchable tail -> whole-word UNK
    assert enc("") == []


def test_unk_counting(spark):
    import pandas as pd

    m = tk.load_tokenizer(MODEL_DIR)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["table scan", "table Zx9 scan"],
    }))
    rows = {r["doc_id"]: r for r in tk.subword_tokens(df, m).collect()}
    assert rows[1]["n_unk_words"] == 0
    assert rows[2]["n_unk_words"] == 1
    assert rows[2]["n_words"] == 3
    assert rows[2]["token_ids"].count(tk.UNK_ID) == 1


def test_artifact_roundtrip_and_version_gate(tmp_path):
    m = tk.load_tokenizer(MODEL_DIR)
    p = str(tmp_path / "tok")
    tk.save_tokenizer(m, p)
    m2 = tk.load_tokenizer(p)
    assert m2.pieces == m.pieces and m2.params == m.params
    # version gate
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pydict({
        "version": pa.array([99], pa.int32()),
        "params": pa.array(["{}"], pa.string()),
    }), os.path.join(p, "meta.parquet"))
    with pytest.raises(ValueError, match="version"):
        tk.load_tokenizer(p)


def test_token_count_tokenizer_option(spark):
    from hgt2osm2_spark.ops import text as text_ops

    m = tk.load_tokenizer(MODEL_DIR)
    d = _docs(spark).limit(20)
    ws = {r["doc_id"]: r for r in text_ops.token_count(d).collect()}
    sw = {r["doc_id"]: r
          for r in text_ops.token_count(d, tokenizer=m).collect()}
    assert set(ws) == set(sw)
    for k in ws:
        assert sw[k]["n_tokens"] == ws[k]["n_tokens"]  # same word count
        assert sw[k]["n_chars_measured"] == ws[k]["n_chars_measured"]
        assert sw[k]["n_subword_pieces"] >= sw[k]["n_tokens"]
