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
