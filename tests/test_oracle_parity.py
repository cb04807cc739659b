"""Unit-level parity checks between a ``queries()`` pipeline and its
``oracle_sql()`` string, run on tiny adversarial tables through DuckDB.

The driver's correctness gate only sees the well-behaved testdata; these
tests pin the tricky equivalences (FP operation order, regex dialect,
argmax-vs-CASE tie-breaks) on inputs chosen to stress them.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestQualityDocumentsOracle:
    """quality_documents vs QUALITY_DOCUMENTS_SQL (bit-exact claim)."""

    TEXTS = [
        "",  # empty: n_chars=0, all counts 0 -> 'und', quality 0.3
        "the and of to a in is that it for",  # pure en stopwords
        "la la la",  # fr/es/it three-way tie -> first-declared (fr) wins
        "der die das und the and",  # de beats en, both nonzero
        "!!! ??? ... ;;;",  # punctuation-only: n_tokens=0 guards
        "don't it's can't",  # apostosphe tokens ([\w']+ vs [\w'']+)
        "word " * 250,  # >200 tokens: clips the length term at 1
        "el y no un una de por el y no",  # es, with 'de' shared with fr
        "x",  # single char, no stopwords
        "the quick brown fox jumps over the lazy dog and runs",
        # VT + \x1c-\x1f: Python \s matches these, RE2 \s does not —
        # the SQL punct class spells them out (latent-divergence probe)
        "a\x0bb \x1c the \x1d end \x1e!\x1f.",
    ]

    @pytest.fixture(scope="class")
    def docs_path(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("qdocs")
        tbl = pa.table({
            "doc_id": pa.array(range(len(self.TEXTS)), type=pa.int64()),
            "text": pa.array(self.TEXTS),
        })
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    def test_bit_exact_parity(self, ray_session, docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.quality_documents(docs_path).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_path}/documents.parquet')")
        oracle = (con.execute(q.QUALITY_DOCUMENTS_SQL).df()
                  .sort_values("doc_id").reset_index(drop=True))
        assert list(mine["lang_pred"]) == list(oracle["lang_pred"])
        assert list(mine["n_tokens"]) == list(oracle["n_tokens"])
        # the headline claim: identical IEEE doubles, not just "close"
        a = mine["quality"].to_numpy(np.float64)
        b = oracle["quality"].to_numpy(np.float64)
        assert np.array_equal(a, b), (a, b)

    def test_tie_break_and_guards(self, ray_session, docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.quality_documents(docs_path).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert mine.loc[0, "lang_pred"] == "und"  # empty text
        assert mine.loc[1, "lang_pred"] == "en"
        assert mine.loc[2, "lang_pred"] == "fr"  # 3-way tie, first wins
        assert mine.loc[3, "lang_pred"] == "de"
        assert mine.loc[4, "lang_pred"] == "und"  # punct-only
        # 250 tokens: length term clipped to exactly 0.4
        assert mine.loc[6, "quality"] >= 0.4


class TestPsiLangBySourceOracle:
    """psi_lang_by_source vs PSI_LANG_BY_SOURCE_SQL, incl. the add-half
    smoothing path for categories a source never emits."""

    def test_parity_on_testdata(self, ray_session, sf_dir):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.psi_lang_by_source(sf_dir)
                .sort_values("source").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        orc = (con.execute(q.PSI_LANG_BY_SOURCE_SQL).df()
               .sort_values("source").reset_index(drop=True))
        assert list(mine["source"]) == list(orc["source"])
        assert np.abs(mine["psi"].to_numpy()
                      - orc["psi"].to_numpy()).max() < 1e-12

    def test_zero_count_smoothing(self, ray_session, tmp_path):
        """A source with a lang at zero count must take the 0.5/n
        Laplace branch identically on both sides (coalesce + greatest
        in SQL, max(get(c,0),0.5) in checks.psi)."""
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        tbl = pa.table({
            "source": ["s0"] * 6 + ["s1"] * 4 + [None, "s0"],
            "lang": ["en", "en", "en", "de", "de", "fr",
                     "en", "en", "en", "en",  # s1 never emits de/fr
                     "en", None],  # NULL keys dropped on both sides
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        mine = (q.psi_lang_by_source(str(tmp_path))
                .sort_values("source").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        orc = (con.execute(q.PSI_LANG_BY_SOURCE_SQL).df()
               .sort_values("source").reset_index(drop=True))
        assert np.abs(mine["psi"].to_numpy()
                      - orc["psi"].to_numpy()).max() < 1e-12
        # both sources genuinely drift from the pooled distribution
        assert (mine["psi"] > 0).all()


class TestEmbeddingDupPairsExactOracle:
    """embedding_dup_pairs_exact vs the DuckDB cross-join oracle."""

    def test_sql_parity_on_testdata(self, ray_session, sf_dir):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = q.embedding_dup_pairs_exact(sf_dir)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/embeddings.parquet')")
        oracle = con.execute(q.EMBEDDING_DUP_PAIRS_EXACT_SQL).df()
        got = {tuple(r) for r in mine[["a", "b"]].to_numpy()}
        want = {tuple(r) for r in oracle[["a", "b"]].to_numpy()}
        assert len(got) == len(mine)  # exactly-once emission
        assert got == want
        assert len(want) > 0  # threshold sits inside the cosine mass

    def test_block_split_invariance(self, ray_session):
        """The a<b dedup must hold for ANY block layout, including the
        one where both members of a pair share a block."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import (
            dedup,
        )

        rng = np.random.default_rng(7)
        base = rng.standard_normal((12, 16))
        vecs = base.copy()
        vecs[5] = base[2] + rng.standard_normal(16) * 1e-3  # near-dup
        vecs[9] = base[7] + rng.standard_normal(16) * 1e-3
        df = pd.DataFrame({"vid": np.arange(12),
                           "emb": list(vecs.astype(np.float32))})
        expected = {(2, 5), (7, 9)}
        for nblocks in (1, 3, 12):
            ds = rd.from_pandas(df).repartition(nblocks)
            out = dedup.embedding_cosine_duplicates_exact(
                ds, "vid", "emb", threshold=0.99).to_pandas()
            got = {tuple(r) for r in out[["a", "b"]].to_numpy()}
            assert got == expected, nblocks

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import (
            dedup,
        )

        df = pd.DataFrame({"vid": pd.Series(dtype=np.int64),
                           "emb": pd.Series(dtype=object)})
        out = dedup.embedding_cosine_duplicates_exact(
            rd.from_pandas(df), "vid", "emb")
        assert out.count() == 0
        # (to_pandas() on zero Ray rows drops schema generally; the
        # Dataset-level schema must still carry the pair columns)
        assert out.schema().names == ["a", "b"]


class TestFingerprintOracles:
    """The round-3 verdict-#3 oracles: the SQL recomputes the identical
    fingerprints (md5 shingle hashes, inlined minhash permutations,
    bit-vote simhash), so parity must hold on adversarial text — not
    just the well-behaved testdata."""

    TEXTS = [
        None,                      # null text -> simhash 0, no shingles
        "",                        # empty -> simhash 0
        "!!! ??? ...",             # tokens exist? no: punct-only
        "one",                     # < k tokens: single joined shingle
        "two words only here",     # 4 tokens < k=5
        "the the the the the the"  # duplicate tokens vote per occurrence
        " unique",
        "don't it's can't word word word",   # apostrophe tokens
        "Ünïcode wörds ärE LOWERED tWice ünïcode wörds",  # unicode lower
        "a b c d e f g h i j k l m n o p",   # many shingles
        "a b c d e f g h i j k l m n o q",   # near-dup of the previous
        "a b c d e f g h i j k l m n o q",   # exact dup of the previous
    ]

    @pytest.fixture(scope="class")
    def docs_path(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("fpdocs")
        tbl = pa.table({
            "doc_id": pa.array(range(len(self.TEXTS)), type=pa.int64()),
            "text": pa.array(self.TEXTS),
        })
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    def _con(self, docs_path):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_path}/documents.parquet')")
        return con

    def test_md5_hash64_matches_md5_number_lower(self):
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )

        strs = ["", "a", "hello world", "ünïcode", "don't",
                "x" * 1000, "line\nbreak", "tab\there", '"quoted"']
        mine = textfn.md5_hash64(np.array(strs, dtype=object))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"s": strs}))
        theirs = con.execute(
            "SELECT md5_number_lower(s)::UBIGINT FROM t").df().iloc[:, 0] \
            .to_numpy(np.uint64)
        assert (mine == theirs).all()

    def test_simhash_oracle_parity(self, ray_session, docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.simhash_documents(docs_path).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        oracle = (self._con(docs_path).execute(q.SIMHASH_DOCUMENTS_SQL)
                  .df().sort_values("doc_id").reset_index(drop=True))
        assert (mine["simhash"].to_numpy(np.uint64)
                == oracle["simhash"].to_numpy(np.uint64)).all()
        # null/empty/punct-only docs hash to 0 on both sides
        assert mine["simhash"].iloc[0] == 0
        assert mine["simhash"].iloc[1] == 0

    def test_simhash_near_dups_oracle_parity(self, ray_session, docs_path):
        """The rotations=4 x prefix=16 pigeonhole configuration must
        reproduce the brute-force all-pairs hamming<=3 set exactly —
        including the hamming-0 groups the null/empty docs form."""
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.simhash_near_dups_documents(docs_path)
                .sort_values(["a", "b"]).reset_index(drop=True))
        oracle = (self._con(docs_path)
                  .execute(q.SIMHASH_NEAR_DUPS_DOCUMENTS_SQL).df()
                  .sort_values(["a", "b"]).reset_index(drop=True))
        assert len(mine) == len(oracle)
        assert (mine[["a", "b", "hamming"]].to_numpy(np.int64)
                == oracle[["a", "b", "hamming"]].to_numpy(np.int64)).all()
        got = {tuple(r) for r in mine[["a", "b"]].to_numpy()}
        assert (9, 10) in got  # the planted exact-dup pair (hamming 0)
        # the null/empty/punct-only docs all hash to 0 -> a hamming-0
        # triangle, found identically by both sides
        assert {(0, 1), (0, 2), (1, 2)} <= got

    def test_minhash_oracle_parity(self, ray_session, docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = (q.minhash_lsh_candidates(docs_path).to_pandas()
                .sort_values(["a", "b"]).reset_index(drop=True))
        oracle = (self._con(docs_path)
                  .execute(q.MINHASH_LSH_CANDIDATES_SQL).df()
                  .sort_values(["a", "b"]).reset_index(drop=True))
        assert len(mine) == len(oracle)
        if len(mine):
            assert (mine[["a", "b"]].to_numpy(np.int64)
                    == oracle[["a", "b"]].to_numpy(np.int64)).all()
        got = {tuple(r) for r in mine[["a", "b"]].to_numpy()}
        assert (9, 10) in got  # exact dups always share every minhash

    def test_minhash_containment_of_true_near_dups(self, ray_session):
        """Round-3 verdict #3a containment property on the real
        testdata: every consecutive-doc pair whose exact word-5-shingle
        Jaccard >= 0.5 must appear in the LSH candidate set (miss
        probability (1-j)^16 <= 1.5e-5 per pair; deterministic on the
        fixed corpus)."""
        from opengauss_tools_datachecker_performance_ray.functions import (
            textfn,
        )
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        sf_dir = "/root/testdata/sf0.001"
        cands = {tuple(r) for r in q.minhash_lsh_candidates(sf_dir)
                 .to_pandas()[["a", "b"]].to_numpy()}
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]) \
            .set_index("doc_id")["text"]
        import re

        pat = re.compile(r"[\w']+")

        def shingles(t):
            toks = pat.findall((t or "").lower())
            if len(toks) < 5:
                return {" ".join(toks)} if toks else set()
            return {" ".join(toks[i:i + 5])
                    for i in range(len(toks) - 4)}

        missed = []
        ids = sorted(docs.index)
        for x, y in zip(ids, ids[1:]):
            sa, sb = shingles(docs[x]), shingles(docs[y])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5 and (x, y) not in cands:
                missed.append((x, y, j))
        assert not missed, missed
        assert textfn is not None

    def test_embedding_lsh_oracle_and_containment(self, ray_session):
        """embedding_dup_pairs vs its hyperplane-replicating SQL on the
        real table, plus the containment property: every LSH pair is in
        the exact all-pairs set at the same threshold (the within-
        bucket verify is exact), i.e. precision 1."""
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )
        from opengauss_tools_datachecker_performance_ray.stages import (
            dedup,
        )
        from opengauss_tools_datachecker_performance_ray.pipelines.queries import (  # noqa: E501
            _read,
        )

        sf_dir = "/root/testdata/sf0.001"
        mine = (q.embedding_dup_pairs(sf_dir)
                .sort_values(["a", "b"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/embeddings.parquet')")
        oracle = (con.execute(q.EMBEDDING_DUP_PAIRS_SQL).df()
                  .sort_values(["a", "b"]).reset_index(drop=True))
        assert mine[["a", "b"]].to_numpy().tolist() \
            == oracle[["a", "b"]].to_numpy().tolist()
        exact = dedup.embedding_cosine_duplicates_exact(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            "vec_id", "embedding", threshold=0.45).to_pandas()
        exact_set = {tuple(r) for r in exact[["a", "b"]].to_numpy()}
        lsh_set = {tuple(r) for r in mine[["a", "b"]].to_numpy()}
        assert lsh_set <= exact_set

    def test_hll_profile_property(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        out = q.hll_profile_documents("/root/testdata/sf0.001")
        assert out["hll_ok"].all()
        assert set(out["col"]) == {"doc_id", "text", "lang", "source",
                                   "n_chars"}
        assert (out["exact_distinct"] <= out["n_rows"]).all()


class TestDriftCompositeOracle:
    """drift_documents_by_source vs its exact-legs SQL, with nulls in
    every participating column (the null-handling conventions are the
    adversarial surface here)."""

    def test_parity_with_nulls(self, ray_session, tmp_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        rng = np.random.default_rng(5)
        n = 1200
        src = rng.choice(["s1", "s2", "s3"], n).astype(object)
        lang = rng.choice(["en", "de"], n).astype(object)
        n_chars = rng.integers(50, 500, n).astype(float)
        src[::101] = None
        lang[::97] = None
        n_chars[::89] = np.nan
        # drifted group: shifted lengths AND skewed langs
        shift = (src == "s3") & np.isfinite(n_chars)
        n_chars[shift] += 400
        lang[(src == "s3") & (lang != None)] = "de"  # noqa: E711
        tbl = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(src, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "n_chars": pa.array(
                [None if not np.isfinite(v) else int(v) for v in n_chars],
                pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        mine = (q.drift_documents_by_source(str(tmp_path))
                .sort_values(["grp", "col"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        oracle = (con.execute(q.DRIFT_DOCUMENTS_BY_SOURCE_SQL).df()
                  .sort_values(["grp", "col"]).reset_index(drop=True))
        assert list(mine["grp"]) == list(oracle["grp"])
        assert list(mine["result"]) == list(oracle["result"])
        assert np.allclose(mine["value"].to_numpy(np.float64),
                           oracle["value"].to_numpy(np.float64),
                           atol=1e-12)
        failed = set(mine.loc[mine["result"] == "failed", "grp"])
        assert "s3" in failed


class TestCurationV4Oracle:
    """corpus_curation_v4 vs CORPUS_CURATION_V4_SQL on a corpus built
    to exercise every stage: a hot source overflowing the 15-doc cap,
    a benchmark doc (id % 97 == 0) contaminating two corpus docs,
    multi-hop shared-shingle duplicate chains, and a zero-token doc."""

    @pytest.fixture(scope="class")
    def docs_path(self, tmp_path_factory):
        P = "quick brown fox jumps over"
        Q = "lazy dog sleeps all day"
        rows = []
        # id 0: benchmark (0 % 97 == 0); contaminates ids 101, 205
        rows.append((0, "bench", f"{P} benchmark only content here"))
        # hot source: 30 docs (cap keeps 15), two of them contaminated
        for i in range(30):
            did = 100 + i
            extra = P if did in (101,) else f"u{i} v{i} w{i} x{i} y{i}"
            rows.append((did, "hot", f"doc {i} of hot source {extra} "
                                     f"a{i} b{i} c{i} d{i} e{i}"))
        # dup chain across two quiet sources: 205 contaminated, 300/301
        # share Q with 302 via overlapping phrases
        rows.append((205, "quiet1", f"{P} something else entirely here"))
        rows.append((300, "quiet1", f"{Q} alpha beta gamma delta eps"))
        rows.append((301, "quiet2", f"{Q} zeta eta theta iota kappa"))
        rows.append((302, "quiet2", "alpha beta gamma delta eps "
                                    "zeta eta theta iota kappa"))
        rows.append((400, "quiet2", ""))  # zero-token doc
        df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        df["doc_id"] = df["doc_id"].astype(np.int64)
        d = tmp_path_factory.mktemp("v4docs")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(d / "documents.parquet"))
        return str(d)

    def test_value_parity(self, ray_session, docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = q.corpus_curation_v4(docs_path)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_path}/documents.parquet')")
        oracle = (con.execute(q.CORPUS_CURATION_V4_SQL).df()
                  .sort_values("source").reset_index(drop=True))
        for c in ("n_docs", "n_tokens", "first_chunk", "last_chunk"):
            oracle[c] = oracle[c].astype(np.int64)
        pd.testing.assert_frame_equal(mine, oracle[mine.columns])
        # stage effects visible in the rollup: benchmark source absent,
        # hot source capped below 15 (cap minus contamination drops)
        by_src = mine.set_index("source")["n_docs"].to_dict()
        assert "bench" not in by_src
        assert by_src["hot"] <= 15


class TestCurationV5Oracle:
    """corpus_curation_v5 vs CORPUS_CURATION_V5_SQL — v4's stages plus
    the Gopher quality gate, on a corpus where every stage visibly
    bites AND the gate runs BEFORE the cap (docs failing the quality
    rules must not consume cap slots; value parity proves the
    ordering)."""

    @pytest.fixture(scope="class")
    def docs_path(self, tmp_path_factory):
        P = "quick brown fox jumps over"   # contamination phrase
        Q = "lazy dog sleeps all day"      # shared dup shingle

        def filler(i, n=28):
            # 2 stopwords + n distinct words: passes every Gopher rule
            return "the a " + " ".join(f"w{i}x{j}" for j in range(n))

        rows = [(0, "bench", f"{P} {filler(0)}")]   # benchmark doc
        # hot source: 20 Gopher-passing docs (cap keeps 15) + 5 short
        # docs the gate must drop WITHOUT consuming cap slots
        for i in range(100, 120):
            rows.append((i, "hot", f"{filler(i)} h{i}a h{i}b h{i}c"))
        for i in range(120, 125):
            rows.append((i, "hot", "tiny doc"))
        # quiet1: one doc contaminated by the benchmark phrase
        rows.append((201, "quiet1", f"{P} {filler(201)}"))
        # quiet2: near-dup pair sharing the 5-token shingle Q
        rows.append((300, "quiet2", f"{Q} {filler(300)}"))
        rows.append((301, "quiet2", f"{Q} {filler(301)}"))
        # quiet3: fails ONLY the stopword rule (35 distinct words)
        rows.append((400, "quiet3",
                     " ".join(f"s{j}q" for j in range(35))))
        # quiet4: fails ONLY the distinct-fraction rule
        rows.append((500, "quiet4", "the a " + "rep " * 38))
        df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        df["doc_id"] = df["doc_id"].astype(np.int64)
        d = tmp_path_factory.mktemp("v5docs")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(d / "documents.parquet"))
        return str(d)

    def test_value_parity_and_stage_effects(self, ray_session,
                                            docs_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        mine = q.corpus_curation_v5(docs_path)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_path}/documents.parquet')")
        oracle = (con.execute(q.CORPUS_CURATION_V5_SQL).df()
                  .sort_values("source").reset_index(drop=True))
        for c in ("n_docs", "n_tokens", "first_chunk", "last_chunk"):
            oracle[c] = oracle[c].astype(np.int64)
        pd.testing.assert_frame_equal(mine, oracle[mine.columns])
        by_src = mine.set_index("source")["n_docs"].to_dict()
        assert "bench" not in by_src     # benchmark split
        assert by_src["hot"] == 15       # gate dropped shorts, cap 15
        assert "quiet1" not in by_src    # decontamination
        assert by_src["quiet2"] == 1     # CC keep-one
        assert "quiet3" not in by_src    # stopword rule
        assert "quiet4" not in by_src    # distinct-fraction rule


def test_curation_v6_mix_before_cap(ray_session, tmp_path, monkeypatch):
    """Adversarial pin for the v6 composition order: the stratified
    mix runs BEFORE the per-source cap, so docs the mix drops must not
    consume cap slots (the same hole class the v5 gate-order test
    pins for the quality gate)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    rng = np.random.default_rng(11)
    # one hot source, two langs; enough sane docs that the Gopher gate
    # keeps them (40+ distinct-ish words incl. stopwords)
    words = [f"word{i}" for i in range(200)]
    texts = []
    for i in range(120):
        w = list(rng.choice(words, size=45, replace=False))
        w[0], w[1] = "the", "and"
        texts.append(" ".join(w))
    df = pd.DataFrame({
        "doc_id": np.arange(1, 121, dtype=np.int64) * 3 + 1,  # skip %97
        "source": ["hot"] * 100 + ["cold"] * 20,
        "lang": (["en", "zh"] * 60),
        "text": texts,
    })
    d = tmp_path / "v6"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))
    mine = q.corpus_curation_v6(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(q.CORPUS_CURATION_V6_SQL).df()
    oracle = oracle.astype({c: np.int64 for c in oracle.columns
                            if c != "source"})
    oracle = oracle.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, oracle)
    # order pin: mix runs BEFORE the cap. Compute the deterministic
    # mix survivors with the same Knuth kernel; with ~27 hot-source
    # survivors the cap still binds (n_docs == 15 given enough
    # chunkable docs), whereas cap-then-mix would keep only
    # ~15 * mix_rate (far below 15).
    from opengauss_tools_datachecker_performance_ray.stages.sampling import (
        knuth_u32, sample_threshold)

    hot_df = df[df["source"] == "hot"]
    u = knuth_u32(hot_df["doc_id"].to_numpy())
    thr = np.where(hot_df["lang"].to_numpy() == "en",
                   sample_threshold(q.GATE_MIX_RATES["en"]),
                   sample_threshold(q.GATE_MIX_RATES["zh"]))
    mix_survivors = int((u < thr.astype(np.uint64)).sum())
    assert mix_survivors > 15  # corpus constructed so the cap binds
    hot = mine[mine["source"] == "hot"]
    assert len(hot) == 1 and int(hot["n_docs"].iloc[0]) == 15


class TestLangDiversityOracle:
    """lang_diversity_by_source vs LANG_DIVERSITY_BY_SOURCE_SQL on an
    adversarial mix: a monoculture source (entropy 0, HHI 1), a
    perfectly uniform one (entropy ln 2, HHI 0.5), and nulls on both
    grouping columns (dropped on both engines)."""

    def test_parity_and_invariants(self, ray_session, tmp_path):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        tbl = pa.table({
            "source": ["mono", "mono", "mono",
                       "uni", "uni", "uni", "uni",
                       "skew", "skew", "skew", "skew",
                       None, "mono"],
            "lang": ["en", "en", "en",
                     "en", "en", "de", "de",
                     "en", "en", "en", "fr",
                     "en", None],
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        mine = q.lang_diversity_by_source(str(tmp_path))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        oracle = con.execute(q.LANG_DIVERSITY_BY_SOURCE_SQL).df()
        assert list(mine["source"]) == list(oracle["source"])
        for c in ("n_docs", "n_langs"):
            assert list(mine[c]) == list(oracle[c])
        for c in ("entropy", "hhi"):
            assert np.allclose(mine[c], oracle[c], rtol=0, atol=1e-12)
        m = mine.set_index("source")
        # null source row and null lang row both dropped: mono keeps 3
        assert m.loc["mono", "n_docs"] == 3
        assert m.loc["mono", "entropy"] == 0.0
        assert m.loc["mono", "hhi"] == 1.0
        assert abs(m.loc["uni", "entropy"] - np.log(2.0)) < 1e-12
        assert m.loc["uni", "hhi"] == 0.5
        # skew sits strictly between monoculture and uniform
        assert 0.0 < m.loc["skew", "entropy"] < np.log(2.0)
        assert 0.5 < m.loc["skew", "hhi"] < 1.0


class TestBenfordDigits:
    def test_adversarial_values(self, ray_session, tmp_path):
        """Digit extraction is integer-only and the exclusion set is
        stated: sub-1, negative, NaN, inf and >= 2^63 values drop on
        both engines; exact powers of 10 and int boundaries keep
        their true leading digit."""
        import duckdb

        import numpy as np
        import pandas as pd

        df = pd.DataFrame({"o_totalprice": [
            1.0, 9.999, 10.0, 99.5, 100.0, 123456.789,
            0.5, 0.0, -42.0, float("nan"), float("inf"), 9.3e18,
            None, 8e17]})
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "orders.parquet")
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )
        out = q.benford_digits_orders(str(sf))
        # kept: 1.0->1, 9.999->9, 10.0->1, 99.5->9, 100.0->1,
        # 123456.789->1, 8e17->8
        assert dict(zip(out["digit"], out["n"])) == {1: 4, 8: 1, 9: 2}
        con = duckdb.connect()
        con.register("orders", df)
        oracle = con.execute(q.BENFORD_DIGITS_ORDERS_SQL).df()
        pd.testing.assert_frame_equal(
            out.astype({"n": "int64"}),
            oracle.astype({"n": "int64",
                           "expected_ppm": "int64"}))
        # the inlined expectation literals sum to ~1e6
        assert abs(int(out["expected_ppm"].iloc[0]) - 301030) == 0
