"""From-scratch BPE tokenizer (functions/bpe.py): unit semantics,
determinism, SQL-replay parity on adversarial texts, and the
token-weighted packing composition.

The cross-engine claim under test: Python ``str.replace`` and DuckDB
``replace`` share left-to-right non-overlapping semantics over the
sentinel representation, so an oracle that re-derives the merges from
the same corpus reproduces ids bit-for-bit.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_tools_datachecker_performance_ray.functions import bpe


class TestTrainMerges:
    def test_sennrich_textbook_example(self):
        # Sennrich et al. 2016 §3.2 walkthrough: first merges are
        # (e,s) count 9, then (es,t) count 9, then (est,.)-less here
        # since we have no </w>; verify the count-then-lex order.
        wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges, word_syms = bpe.train_merges(wf, 3)
        assert merges[0] == ("e", "s")   # 6+3=9, beats (l,o)=7 etc.
        assert merges[1] == ("es", "t")  # still 9
        # rank 3: remaining max is (l,o)=7 (low+lower)
        assert merges[2] == ("l", "o")
        assert word_syms["newest"] == ["n", "e", "w", "est"]
        assert word_syms["low"] == ["lo", "w"]

    def test_greedy_left_to_right_overlap(self):
        # 'aaaa' + merge (a,a) must become [aa, aa] (non-overlapping
        # left-to-right), and the next round merges (aa, aa).
        merges, word_syms = bpe.train_merges({"aaaa": 1}, 2)
        assert merges[0] == ("a", "a")
        assert merges[1] == ("aa", "aa")
        assert word_syms["aaaa"] == ["aaaa"]

    def test_lexicographic_tie_break(self):
        # 'ba' and 'ab' both count 1: (a,b) < (b,a) lexicographically.
        merges, _ = bpe.train_merges({"ab": 1, "ba": 1}, 1)
        assert merges[0] == ("a", "b")

    def test_early_stop_when_no_pairs(self):
        merges, word_syms = bpe.train_merges({"a": 3, "b": 1}, 10)
        assert merges == []
        assert word_syms == {"a": ["a"], "b": ["b"]}

    def test_determinism(self):
        wf = {"abab": 3, "baba": 2, "aabb": 5, "x": 1}
        a = bpe.train_merges(dict(wf), 6)
        b = bpe.train_merges(dict(reversed(list(wf.items()))), 6)
        assert a == b


class TestTokenizer:
    def test_corpus_word_lookup_and_oov_replay(self):
        tok = bpe.BpeTokenizer.from_word_freq(
            {"hello": 4, "help": 2, "yell": 1}, 4)
        for w in ("hello", "help", "yell"):
            assert tok.encode_word(w) == tok.word_ids[w]
        # OOV decomposable into corpus-final symbols: every id known
        # and ids join back to the word ('yelp' -> [y, el, p])
        ids = tok.encode_word("yelp")
        assert all(i > 0 for i in ids)
        inv = {v: k for k, v in tok.sym_id.items()}
        assert "".join(inv[i] for i in ids) == "yelp"
        # OOV forming a merge product ('hell') that no corpus word
        # keeps as a FINAL symbol -> <unk> id 0 (vocab is the corpus's
        # final symbols, matching the oracle's DISTINCT final_syms)
        assert 0 in tok.encode_word("hellyell")
        # unseen character -> <unk> id 0
        assert 0 in tok.encode_word("z!")

    def test_encode_splits_like_words_of(self):
        tok = bpe.BpeTokenizer.from_word_freq({"ab": 2, "cd": 1}, 1)
        assert tok.encode("ab  cd\nab") == (
            list(tok.word_ids["ab"]) + list(tok.word_ids["cd"])
            + list(tok.word_ids["ab"]))
        assert tok.encode(None) == []
        assert tok.encode("   ") == []
        assert tok.n_tokens("ab cd") == len(tok.encode("ab cd"))

    @given(st.dictionaries(
        st.text(st.characters(min_codepoint=33, max_codepoint=0x2FF),
                min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_symbols_always_reconstruct_words(self, wf):
        wf = {w: n for w, n in wf.items()
              if bpe.SYM_OPEN not in w and bpe.SYM_CLOSE not in w}
        if not wf:
            return
        merges, word_syms = bpe.train_merges(wf, 5)
        for w, syms in word_syms.items():
            assert "".join(syms) == w
        tok = bpe.BpeTokenizer.from_word_freq(wf, 5)
        for w in wf:
            assert tok.encode_word(w) == tok.word_ids[w]


ADVERSARIAL_TEXTS = [
    None,                                  # null text -> 0 tokens
    "",                                    # empty -> 0 tokens
    "the the the the cat sat on the mat",
    "aaaa aaa aa a aaaa",                  # overlap-order stress
    "naïve café über façade",              # unicode multi-byte chars
    "tabs\tand\nnewlines\rmix  runs",      # the declared ASCII splitter
    "x\x1ey z\x1fw plain",                 # sentinel bytes: words dropped
    "ab ab ab ba ba cd",                   # tie-break visible in ids
    "don't it's 'quoted' (parens)!",
    " nbsp is not a separator",       # NBSP: one word on BOTH sides
]


@pytest.fixture(scope="module")
def adv_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpedocs")
    tbl = pa.table({
        "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), pa.int64()),
        "text": pa.array(ADVERSARIAL_TEXTS, pa.string()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _oracle(docs_path: str, sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{docs_path}/documents.parquet')")
    return con.execute(sql).df()


class TestOracleParity:
    def test_tokenize_parity_adversarial(self, ray_session, adv_docs):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.bpe_tokenize_documents(adv_docs)
                .sort_values("doc_id").reset_index(drop=True))
        oracle = (_oracle(adv_docs, q.BPE_TOKENIZE_DOCUMENTS_SQL)
                  .sort_values("doc_id").reset_index(drop=True))
        assert list(mine["n_tokens"]) == list(oracle["n_tokens"])
        assert list(mine["ids_md5"]) == list(oracle["ids_md5"])
        assert mine.loc[0, "n_tokens"] == 0  # null text
        assert mine.loc[1, "n_tokens"] == 0  # empty text

    def test_pack_parity_adversarial(self, ray_session, adv_docs):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.bpe_pack_documents(adv_docs)
                .sort_values("doc_id").reset_index(drop=True))
        oracle = (_oracle(adv_docs, q.BPE_PACK_DOCUMENTS_SQL)
                  .sort_values("doc_id").reset_index(drop=True))
        for c in ("n_tokens", "offset", "chunk_first", "chunk_last"):
            assert list(mine[c]) == list(oracle[c]), c
        # the prefix-sum invariant: offset is the running total
        n = mine["n_tokens"].to_numpy(np.int64)
        off = mine["offset"].to_numpy(np.int64)
        assert np.array_equal(
            off, np.concatenate([[0], np.cumsum(n)[:-1]]))

    def test_merge_table_parity_adversarial(self, ray_session, adv_docs):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.bpe_merge_table_documents(adv_docs)
                .sort_values("rank").reset_index(drop=True))
        oracle = (_oracle(adv_docs, q.BPE_MERGE_TABLE_DOCUMENTS_SQL)
                  .sort_values("rank").reset_index(drop=True))
        assert len(mine) == len(oracle)
        for c in ("rank", "lhs", "rhs", "merged"):
            assert list(mine[c]) == list(oracle[c]), c
        # merged is always the concatenation, ranks are 1..n
        assert (mine["lhs"] + mine["rhs"] == mine["merged"]).all()
        assert list(mine["rank"]) == list(range(1, len(mine) + 1))

    def test_python_training_matches_sql_chain_small(self, adv_docs):
        # engine-free check: the word->final-symbols map the SQL chain
        # derives equals Python train_merges on the same word counts
        from collections import Counter

        wf = Counter(w for t in ADVERSARIAL_TEXTS
                     for w in bpe.words_of(t))
        _, word_syms = bpe.train_merges(dict(wf), 12)
        sc, so = "chr(31)", "chr(30)"
        sql = (bpe._oracle_cte_chain(12, "documents", "doc_id", "text")
               + f""" SELECT word,
  string_split(substr(rep, 2, len(rep) - 2), {sc} || {so}) AS s
FROM rep12 ORDER BY word""")
        got = _oracle(adv_docs, sql)
        sql_syms = dict(zip(got["word"], (list(s) for s in got["s"])))
        assert sql_syms == {w: s for w, s in word_syms.items()}


class TestMinFreqOovPath:
    def test_floored_vocab_fallback_matches_encode(self, ray_session,
                                                   adv_docs):
        """The gate encode pattern — word_ids hit with a word_ids-free
        OOV encoder as fallback — must reproduce the tokenizer's own
        encode_word for words floored out by min_freq (the 100-TB
        vocabulary-bounding knob)."""
        import ray.data as rd

        ds = rd.read_parquet(f"{adv_docs}/documents.parquet",
                             columns=["text"])
        wf_all = bpe.word_freq_from_dataset(ds, "text")
        wf = bpe.word_freq_from_dataset(ds, "text", min_freq=2)
        hapax = set(wf_all) - set(wf)
        assert hapax  # the fixture has singleton words
        tok = bpe.BpeTokenizer.from_word_freq(wf, 8)
        oov = bpe.BpeTokenizer(tok.merges, tok.sym_id, {})
        wids = tok.word_ids
        for w in sorted(wf_all):
            got = wids.get(w) or oov.encode_word(w)
            assert tuple(got) == tok.encode_word(w)
        for w in sorted(hapax):
            assert w not in wids  # would have been the KeyError

    def test_gate_tokenizer_memoized(self, ray_session, adv_docs):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        q._BPE_TOK_CACHE.clear()
        t1 = q._gate_bpe_tokenizer(adv_docs)
        t2 = q._gate_bpe_tokenizer(adv_docs)
        assert t1 is t2  # trained once, reused by all three gates
