"""Adversarial parity + kernel tests for the round-4 continuation text
operators: normalization (NFC/lower/collapse with md5 byte-parity),
Gopher-rule quality filter, fixed-vocabulary keyword search, and the
JSONL sink/source round-trip.

Same contract as test_oracle_parity: the driver gate only sees
well-behaved testdata, so these fixtures stress the equivalences that
could silently diverge — unicode normalization forms, non-ASCII
whitespace vs RE2's ASCII ``\\s``, apostrophe tokens, JSON escaping of
quotes/backslashes/newlines/non-BMP code points, and each Gopher rule
failing in isolation.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "",                                    # 0 empty
    "  The  QUICK\t brown FOX  ",          # 1 trim + collapse + case
    "éclair ÉCLAIR",            # 2 NFC composition + lower
    "a b",                            # 3 NBSP is NOT RE2 \s: kept
    "don't don vector vectors",            # 4 token equality, not substr
    "the a of to and " * 8,                # 5 40 words but 5 distinct:
                                           #   fails the distinct rule
    "the a " + " ".join(f"w{i}" for i in range(30)),
                                           # 6 32 words all distinct,
                                           #   2 stopwords, mwl at the
                                           #   exact lower bound: keep
    "the a " + "supercalifragilistic " * 33,  # 7 mean word len > 10
    "the a of to and " + "word wort word tok en chars go by now ok "
    * 3,                                   # 8 passes every rule
    "one two",                             # 9 < 30 words
    'quote " back \\ slash / newline\nand\ttab the a',  # 10 escaping
    "emoji \U0001F600 plane \U0001D11E unicode",        # 11 non-BMP
]
LANGS = ["en", "de", "en", "fr", "en", "de",
         "en", "de", "en", "fr", "en", "de"]


@pytest.fixture(scope="module")
def docs_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("textops")
    tbl = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS),
        "lang": pa.array(LANGS),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(docs_path):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{docs_path}/documents.parquet')")
    return c


def _q():
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries,
    )
    return queries


class TestNormalizeText:
    def test_kernel_semantics(self):
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )

        out = textfn.normalize_text(pa.array(TEXTS)).to_pylist()
        assert out[1] == "the quick brown fox"
        # combining e + U+0301 composes to the same bytes as lower(É)
        assert out[2] == "éclair éclair"
        # NBSP is not ASCII \s: neither collapsed nor trimmed
        assert out[3] == "a b"
        assert out[0] == ""
        assert textfn.normalize_text(
            pa.array([None], type=pa.string())).to_pylist() == [""]

    def test_oracle_parity(self, ray_session, docs_path, con):
        q = _q()
        mine = q.normalize_text_documents(docs_path)
        oracle = (con.execute(q.NORMALIZE_TEXT_DOCUMENTS_SQL).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert list(mine["norm_chars"]) == list(oracle["norm_chars"])
        assert [int(x) for x in mine["norm_hash"]] == \
            [int(x) for x in oracle["norm_hash"]]


class TestGopherFilter:
    def test_feature_kernel(self):
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )

        f = textfn.gopher_features(pa.array(TEXTS))
        # doc 4: don't / don / vector / vectors — apostrophe token kept
        assert f.loc[4, "n_words"] == 4
        assert f.loc[4, "n_distinct_words"] == 4
        # doc 5: 40 tokens, 5 distinct, all stopwords
        assert f.loc[5, "n_words"] == 40
        assert f.loc[5, "n_distinct_words"] == 5
        assert f.loc[5, "n_stopwords"] == 40
        assert f.loc[0, "n_words"] == 0

    def test_each_rule_bites(self, ray_session, docs_path):
        q = _q()
        kept = set(q.gopher_filter_documents(docs_path)["doc_id"])
        assert 9 not in kept   # word-count rule (< 30)
        assert 7 not in kept   # mean-word-length rule (> 10)
        assert 5 not in kept   # distinct-fraction rule (5*5 <= 40)
        assert 6 in kept       # 42 words, 2 stopwords, short tokens
        assert 8 in kept       # passes every rule
        # stopword rule: doc 6 minus its stopwords would fail
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )
        f = textfn.gopher_features(pa.array(["zz " * 40]))
        assert f.loc[0, "n_stopwords"] == 0  # would fail min_stop=2

    def test_oracle_parity(self, ray_session, docs_path, con):
        q = _q()
        mine = q.gopher_filter_documents(docs_path)
        oracle = (con.execute(q.GOPHER_FILTER_DOCUMENTS_SQL).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert mine.astype("int64").equals(oracle.astype("int64"))


class TestKeywordSearch:
    TERMS = ("vector", "don", "the")

    def test_token_equality_not_substring(self, ray_session, docs_path):
        q = _q()
        out = q.keyword_search_documents(docs_path, terms=self.TERMS)
        row = out[out["doc_id"] == 4].iloc[0]
        # 'vectors' does not count toward 'vector'; "don't" is one
        # token and does not count toward 'don'
        assert row["tf_vector"] == 1
        assert row["tf_don"] == 1
        assert row["dl"] == 4

    def test_oracle_parity_with_ranking(self, ray_session, docs_path,
                                        con):
        q = _q()
        mine = q.keyword_search_documents(docs_path, terms=self.TERMS,
                                          k=3)
        sql = q._keyword_search_sql(self.TERMS, 3)
        oracle = (con.execute(sql).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert len(mine) == 3
        assert mine.astype("int64").equals(oracle.astype("int64"))


class TestJsonlRoundtrip:
    def test_escaping_survives(self, ray_session, docs_path, con):
        """Quotes, backslashes, embedded newlines/tabs and non-BMP
        code points must survive the write_json -> read_json cycle:
        the per-lang md5-XOR only matches the straight-from-parquet
        oracle when every byte round-tripped."""
        q = _q()
        mine = q.jsonl_roundtrip_documents(docs_path)
        oracle = (con.execute(q.JSONL_ROUNDTRIP_DOCUMENTS_SQL).df()
                  .sort_values("lang").reset_index(drop=True))
        assert list(mine["lang"]) == list(oracle["lang"])
        assert list(mine["n_docs"]) == list(oracle["n_docs"])
        assert list(mine["sum_doc_id"]) == list(oracle["sum_doc_id"])
        assert list(mine["sum_chars"]) == list(oracle["sum_chars"])
        assert [int(x) for x in mine["text_hash_xor"]] == \
            [int(x) for x in oracle["text_hash_xor"]]


class TestBM25:
    TERMS = ("vector", "the", "w3")  # rare / common / singleton

    def test_bit_exact_parity(self, ray_session, docs_path, con):
        q = _q()
        mine = q.bm25_search_documents(docs_path, terms=self.TERMS,
                                       k=10)
        sql = q._bm25_search_sql(self.TERMS, 10)
        oracle = (con.execute(sql).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert len(mine) == len(oracle)
        # the headline claim: identical IEEE doubles, not "close"
        assert np.array_equal(mine["bm25"].to_numpy(np.float64),
                              oracle["bm25"].to_numpy(np.float64))
        assert list(mine["doc_id"]) == list(oracle["doc_id"])

    def test_idf_orders_rarity(self, ray_session, docs_path):
        """A singleton term must outscore an everywhere term at equal
        tf: doc 6 holds the corpus' only 'w3' (tf=1) plus one 'the';
        its score must exceed any doc whose only match is 'the'."""
        q = _q()
        out = q.bm25_search_documents(docs_path, terms=self.TERMS,
                                      k=12).set_index("doc_id")
        only_the = [d for d in out.index
                    if d not in (4, 6) and out.loc[d, "total_tf"] >= 1]
        assert out.loc[6, "bm25"] > max(
            out.loc[d, "bm25"] for d in only_the)

    def test_empty_corpus(self, ray_session, tmp_path):
        import pyarrow.parquet as pqw
        d = tmp_path / "empty"
        d.mkdir()
        pqw.write_table(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string())}),
            str(d / "documents.parquet"))
        q = _q()
        out = q.bm25_search_documents(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "bm25", "dl",
                                     "total_tf"]


class TestWinnowingProfile:
    def test_window_boundary_branches(self):
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )

        # len < k: no grams at all
        assert len(textfn.winnowing_fingerprints(
            "abc", hash_fn=textfn.md5_hash64)) == 0
        # exactly window grams (len 8 -> 4 grams): single global min
        assert len(textfn.winnowing_fingerprints(
            "abcdefgh", hash_fn=textfn.md5_hash64)) == 1
        # one past the boundary: two sliding windows
        assert len(textfn.winnowing_fingerprints(
            "abcdefghi", hash_fn=textfn.md5_hash64)) <= 2

    def test_oracle_parity(self, ray_session, docs_path, con):
        """Covers empty text, texts shorter than k, the ng<=window
        short branch ('one two' -> 3 grams), NBSP and non-BMP chars
        (substr/len are code-point-based on both engines)."""
        q = _q()
        mine = q.winnowing_profile_documents(docs_path)
        oracle = (con.execute(q.WINNOWING_PROFILE_DOCUMENTS_SQL).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert list(mine["n_fps"]) == list(oracle["n_fps"])
        assert [int(x) for x in mine["fp_xor"]] == \
            [int(x) for x in oracle["fp_xor"]]


class TestFuzzUnicodeParity:
    """Seeded random corpus over an adversarial alphabet (ASCII,
    control whitespace, NBSP, combining marks, precomposed accents,
    CJK, non-BMP emoji, quotes/backslashes): every text operator must
    hash/value-match its SQL oracle on it, not just on the tame
    testdata."""

    @pytest.fixture(scope="class")
    def fuzz_path(self, tmp_path_factory):
        rng = np.random.RandomState(20260818)
        alphabet = np.array(
            list("abcd XYZ012_'\"\\\t\n\r") + [
                "\u00a0", "\u0301", "\u0308", "\u00e9", "\u00c9",
                "\u4e2d", "\u6587", "\U0001F600", "\u000b", "  "],
            dtype=object)
        texts = ["".join(rng.choice(alphabet, size=rng.randint(0, 80)))
                 for _ in range(300)]
        d = tmp_path_factory.mktemp("fuzzdocs")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([("en", "de", "fr")[i % 3]
                              for i in range(len(texts))]),
        }), str(d / "documents.parquet"))
        return str(d)

    @pytest.fixture(scope="class")
    def fuzz_con(self, fuzz_path):
        c = duckdb.connect()
        c.execute(f"CREATE VIEW documents AS SELECT * FROM "
                  f"read_parquet('{fuzz_path}/documents.parquet')")
        return c

    @pytest.mark.parametrize("query,sql_attr,sort_col", [
        ("normalize_text_documents", "NORMALIZE_TEXT_DOCUMENTS_SQL",
         "doc_id"),
        ("winnowing_profile_documents",
         "WINNOWING_PROFILE_DOCUMENTS_SQL", "doc_id"),
        ("gopher_filter_documents", "GOPHER_FILTER_DOCUMENTS_SQL",
         "doc_id"),
        ("bm25_search_documents", "BM25_SEARCH_DOCUMENTS_SQL",
         "doc_id"),
        ("jsonl_roundtrip_documents", "JSONL_ROUNDTRIP_DOCUMENTS_SQL",
         "lang"),
    ])
    def test_parity(self, ray_session, fuzz_path, fuzz_con, query,
                    sql_attr, sort_col):
        q = _q()
        mine = getattr(q, query)(fuzz_path)
        oracle = (fuzz_con.execute(getattr(q, sql_attr)).df()
                  .sort_values(sort_col).reset_index(drop=True))
        assert len(mine) == len(oracle), (len(mine), len(oracle))
        assert list(mine.columns) == list(oracle.columns)
        for c in mine.columns:
            a, b = mine[c], oracle[c]
            if str(a.dtype).startswith("float"):
                assert np.array_equal(a.to_numpy(np.float64),
                                      b.to_numpy(np.float64)), c
            elif str(a.dtype).startswith("uint"):
                assert [int(x) for x in a] == [int(x) for x in b], c
            else:
                assert list(a) == list(b), c


class TestVocabulary:
    def test_oracle_parity_and_tie_break(self, ray_session, docs_path,
                                         con):
        q = _q()
        mine = q.vocabulary_documents(docs_path)
        oracle = (con.execute(q.VOCABULARY_DOCUMENTS_SQL).df()
                  .sort_values("term_id").reset_index(drop=True))
        assert list(mine["term"]) == list(oracle["term"])
        for c in ("term_id", "n_occur", "df"):
            assert list(mine[c]) == list(oracle[c]), c
        # tie-break determinism: the 30 singleton 'w<i>' tokens of
        # doc 6 all have n_occur == 1 and must rank lexicographically
        v = mine.set_index("term")
        singles = [t for t in v.index
                   if t.startswith("w") and v.loc[t, "n_occur"] == 1]
        ids = [int(v.loc[t, "term_id"]) for t in sorted(singles)]
        assert ids == sorted(ids) and len(singles) >= 30
        # df vs n_occur: 'the' occurs more times than docs containing it
        assert v.loc["the", "n_occur"] >= v.loc["the", "df"]

    def test_top_v_limit(self, ray_session, docs_path):
        q = _q()
        out = q.vocabulary_documents(docs_path, top_v=5)
        assert len(out) == 5
        assert list(out["term_id"]) == [1, 2, 3, 4, 5]


class TestReviewFixes:
    """Pins the code-review findings: apostrophe terms must be
    oracle-able (escaped literal + quoted alias), and a NULL lang must
    form its own rollup group instead of crashing the partial."""

    def test_apostrophe_term_oracles(self, ray_session, docs_path,
                                     con):
        q = _q()
        terms = ("don't", "vector")
        mine = q.keyword_search_documents(docs_path, terms=terms, k=5)
        oracle = (con.execute(q._keyword_search_sql(terms, 5)).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert list(mine.columns) == list(oracle.columns)
        assert mine.astype("int64").equals(oracle.astype("int64"))
        assert mine.set_index("doc_id").loc[4, "tf_don't"] == 1
        b_mine = q.bm25_search_documents(docs_path, terms=terms, k=5)
        b_ora = (con.execute(q._bm25_search_sql(terms, 5)).df()
                 .sort_values("doc_id").reset_index(drop=True))
        assert np.array_equal(b_mine["bm25"].to_numpy(np.float64),
                              b_ora["bm25"].to_numpy(np.float64))

    def test_jsonl_null_lang_group(self, ray_session, tmp_path):
        import pyarrow.parquet as pqw
        d = tmp_path / "nulllang"
        d.mkdir()
        pqw.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["aa", "bb", "cc"]),
            "lang": pa.array(["en", "en", None]),
        }), str(d / "documents.parquet"))
        q = _q()
        out = q.jsonl_roundtrip_documents(str(d))
        assert len(out) == 2
        nulls = out[out["lang"].isna()]
        assert len(nulls) == 1
        assert int(nulls.iloc[0]["n_docs"]) == 1
        assert int(nulls.iloc[0]["sum_doc_id"]) == 3
        en = out[out["lang"] == "en"].iloc[0]
        assert int(en["n_docs"]) == 2 and int(en["sum_doc_id"]) == 3


class TestVocabularyCardinality:
    def test_50k_distinct_terms_parity(self, ray_session,
                                       tmp_path_factory):
        """High-cardinality vocab: 5k docs x 10 unique terms + a few
        hot terms — exercises the real groupby + distributed-sort path
        (not the tiny-vocab shortcut) and the top-V cut through a band
        of equal-count terms where only the lexicographic tie-break
        decides membership."""
        rng = np.random.RandomState(7)
        texts = []
        for i in range(5000):
            uniq = " ".join(f"t{i}_{j}" for j in range(10))
            hot = " ".join(rng.choice(["alpha", "beta", "gamma"],
                                      size=rng.randint(0, 4)))
            texts.append(f"{uniq} {hot}")
        d = tmp_path_factory.mktemp("bigvocab")
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }), str(d / "documents.parquet"))
        q = _q()
        mine = q.vocabulary_documents(str(d), top_v=500)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        oracle = (con.execute(q._vocabulary_sql(500)).df()
                  .sort_values("term_id").reset_index(drop=True))
        assert len(mine) == 500
        assert list(mine["term"]) == list(oracle["term"])
        assert list(mine["term_id"]) == list(oracle["term_id"])
        assert list(mine["n_occur"]) == list(oracle["n_occur"])
        # the hot terms outrank every singleton
        assert set(mine.head(3)["term"]) == {"alpha", "beta", "gamma"}


def test_top_bigrams_boundary_masking(ray_session, tmp_path):
    """Bigrams never span documents: the pair (last token of doc A,
    first token of doc B) must not appear."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    d = tmp_path / "big"
    d.mkdir()
    # 'b a' would be the top bigram if doc boundaries leaked
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": ["en"] * 4,
        "text": ["a b", "a b", "a b", "a b"],
    })
    pq.write_table(t, str(d / "documents.parquet"))
    out = q.top_bigrams_by_lang(str(d))
    assert out["bigram"].tolist() == ["a b"]
    assert int(out["n"].iloc[0]) == 4
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(q.TOP_BIGRAMS_BY_LANG_SQL).df()
    pd.testing.assert_frame_equal(out, oracle.astype({"n": "int64"}))


class TestSurprisal:
    """Unigram-LM surprisal scoring: integer bit-length formulation
    (order-free sums) vs the DuckDB oracle and a from-first-principles
    recomputation."""

    def test_matches_oracle(self, ray_session, docs_path, con):
        q = _q()
        got = q.surprisal_documents(docs_path)
        exp = con.execute(q.SURPRISAL_DOCUMENTS_SQL).df()
        assert got.reset_index(drop=True).equals(
            exp.astype(got.dtypes.to_dict()).reset_index(drop=True))

    def test_formula_from_first_principles(self, ray_session, tmp_path):
        import re
        from collections import Counter

        q = _q()
        texts = ["the cat sat", "the the dog", "", None, "zebra"]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), str(tmp_path / "documents.parquet"))

        toks = {i: re.findall(r"[A-Za-z0-9_']+", (t or "").lower())
                for i, t in enumerate(texts)}
        tf = Counter(w for ws in toks.values() for w in ws)
        n = sum(tf.values())
        exp_rows = []
        for i, ws in toks.items():
            if not ws:
                continue  # zero-token docs are absent on both engines
            bits = sum(n.bit_length() - tf[w].bit_length() for w in ws)
            exp_rows.append((i, len(ws), bits,
                             (bits * 1000) // len(ws)))
        got = q.surprisal_documents(str(tmp_path))
        assert [tuple(r) for r in got.to_numpy()] == exp_rows
        # sanity on the example: 'zebra' (tf=1) is the rarest token,
        # so doc 4 has the highest mean surprisal
        assert got.loc[got["doc_id"] == 4, "mean_millibits"].iloc[0] \
            == got["mean_millibits"].max()
