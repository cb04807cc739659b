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
