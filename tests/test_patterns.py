"""Pattern scan / redaction (PII presets) + duplicated-span histogram.

The synthetic documents corpus contains no PII, so the presets' REAL
behavior (emails, IPs, phones found and redacted) is pinned here on
strings that do contain them, with DuckDB's RE2 engine as the parity
oracle — the same literal patterns must count and replace identically
on both engines (the contract ``pattern_scan_documents`` relies on).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from opengauss_tools_datachecker_performance_ray.functions import textfn

SAMPLES = [
    "contact alice@example.com or bob.smith+tag@mail.example.co today",
    "servers 10.0.0.1 and 192.168.1.255; call 555-123-4567 or 555 987 6543",
    "no pii here, just table scan spark spark",
    "edge@case.io.",  # trailing dot stays outside the match
    "",
    None,
]


def test_pii_counts_expected():
    df = textfn.pattern_counts(pd.Series(SAMPLES), textfn.PII_PATTERNS)
    assert df["email"].tolist() == [2, 0, 0, 1, 0, 0]
    assert df["ipv4"].tolist() == [0, 2, 0, 0, 0, 0]
    # "555 987 6543" matches the [- .] separator class too
    assert df["phone"].tolist() == [0, 2, 0, 0, 0, 0]


def test_pii_counts_match_duckdb():
    con = duckdb.connect()
    df = textfn.pattern_counts(pd.Series(SAMPLES), textfn.PII_PATTERNS)
    for name, pat in textfn.PII_PATTERNS.items():
        oracle = [con.execute(
            "SELECT len(regexp_extract_all(coalesce(?, ''), ?))",
            [t, pat]).fetchone()[0] for t in SAMPLES]
        assert df[name].tolist() == oracle, name


def test_redact_matches_duckdb():
    con = duckdb.connect()
    got = textfn.redact(pd.Series(SAMPLES), textfn.PII_PATTERNS,
                        token="[X]").tolist()
    for t, g in zip(SAMPLES, got):
        expr, params = "coalesce(?, '')", [t]
        for pat in textfn.PII_PATTERNS.values():
            expr = f"regexp_replace({expr}, ?, '[X]', 'g')"
            params.append(pat)
        assert g == con.execute(f"SELECT {expr}", params).fetchone()[0]


def test_redact_removes_all_matches():
    red = textfn.redact(pd.Series(SAMPLES), textfn.PII_PATTERNS)
    counts = textfn.pattern_counts(red, textfn.PII_PATTERNS)
    assert not counts.to_numpy().any()


def _brute_histogram(texts: list[str], k: int = 5) -> dict[int, int]:
    per_doc = []
    for t in texts:
        toks = textfn._WORD_RE.findall((t or "").lower())
        if len(toks) >= k:
            per_doc.append({" ".join(toks[j:j + k])
                            for j in range(len(toks) - k + 1)})
        elif toks:
            per_doc.append({" ".join(toks)})
        else:
            per_doc.append(set())
    sharing: dict[str, int] = {}
    for sh_set in per_doc:
        for s in sh_set:
            sharing[s] = sharing.get(s, 0) + 1
    hist: dict[int, int] = {}
    for c in sharing.values():
        hist[c] = hist.get(c, 0) + 1
    return hist


def test_dup_span_histogram_matches_brute_force(ray_session):
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.stages.dedup import (
        dup_span_histogram,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",   # shares 5-gram
        "a quick brown fox jumps over a fence today",     # with doc 0
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "completely different words in this document here now",
        "tiny doc",                                       # < k tokens
        "",                                                # no shingles
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = dup_span_histogram(rd.from_pandas(df).repartition(3),
                             "doc_id", "text", k=5).to_pandas()
    got = dict(zip(got["docs_sharing"], got["n_shingles"]))
    assert got == _brute_histogram(texts)


def test_dup_span_histogram_repeated_span_within_doc(ray_session):
    """A span repeated INSIDE one doc counts that doc once."""
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.stages.dedup import (
        dup_span_histogram,
    )

    span = "one two three four five"
    texts = [f"{span} filler {span}", span]
    df = pd.DataFrame({"doc_id": [1, 2], "text": texts})
    got = dup_span_histogram(rd.from_pandas(df), "doc_id", "text",
                             k=5).to_pandas()
    got = dict(zip(got["docs_sharing"], got["n_shingles"]))
    assert got == _brute_histogram(texts)
    assert got[2] == 1  # exactly the shared 5-gram


@pytest.mark.parametrize("name", ["dup_spans_documents",
                                  "pattern_scan_documents",
                                  "span_dup_scores_documents",
                                  "corpus_curation_v3",
                                  "rules_aggregate_v2_documents"])
def test_gate_parity_sf0001(ray_session, sf_dir, name):
    """Driver-gate simulation at sf0.001 for entries whose oracles
    need only the documents view."""
    import __ray_entry__ as e

    res = e.queries()[name](sf_dir)
    got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(e.oracle_sql()[name]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --- adversarial parity: random strings over the PII alphabet --------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PII_ALPHABET = st.sampled_from(list(
    "ab9@.-+ _%" "05: ()"))
_pii_text = st.text(alphabet=_PII_ALPHABET, max_size=60)


@settings(deadline=None, max_examples=60)
@given(st.lists(st.one_of(st.none(), _pii_text), min_size=1, max_size=8))
def test_pattern_parity_fuzz(texts):
    """The same literal pattern must count AND redact identically on
    python re (Ray kernel) and RE2 (DuckDB oracle) for arbitrary
    strings over the PII pattern alphabet — the portability contract
    ``pattern_scan_documents`` depends on."""
    con = duckdb.connect()
    s = pd.Series(texts, dtype=object)
    counts = textfn.pattern_counts(s, textfn.PII_PATTERNS)
    red = textfn.redact(s, textfn.PII_PATTERNS, token="[X]").tolist()
    for i, t in enumerate(texts):
        expr, params = "coalesce(?, '')", [t]
        for name, pat in textfn.PII_PATTERNS.items():
            n = con.execute(
                "SELECT len(regexp_extract_all(coalesce(?, ''), ?))",
                [t, pat]).fetchone()[0]
            assert counts[name].iloc[i] == n, (name, t)
            expr = f"regexp_replace({expr}, ?, '[X]', 'g')"
            params.append(pat)
        assert red[i] == con.execute(
            f"SELECT {expr}", params).fetchone()[0], t


# --- sequential preset chain (redact_chain / redact_events_props) ----

CHAIN_SAMPLES = [
    "mail a9@b.co from 10.0.0.1 call +1 (555) 123-4567 now",
    "just 12345 numbers 6789",
    "overlap: 1.2.3.4@not-an-ip and 999.999.999.999",
    "unicode façade naïve 42",
    "",
    None,
]
_CHAIN = ("email", "ipv4", "phone", "number")


def _duckdb_chain(con, t, presets):
    cur = con.execute("SELECT coalesce(?, '')", [t]).fetchone()[0]
    total = 0
    for name in presets:
        pat, rep = textfn.REDACT_PRESETS[name]
        total += con.execute("SELECT len(regexp_extract_all(?, ?))",
                             [cur, pat]).fetchone()[0]
        cur = con.execute("SELECT regexp_replace(?, ?, ?, 'g')",
                          [cur, pat, rep]).fetchone()[0]
    return cur, total


def test_redact_chain_matches_duckdb():
    import pyarrow as pa

    con = duckdb.connect()
    red, n = textfn.redact_chain(
        pa.array(CHAIN_SAMPLES, type=pa.string()), _CHAIN)
    red = red.to_pylist()
    for i, t in enumerate(CHAIN_SAMPLES):
        want_text, want_n = _duckdb_chain(con, t, _CHAIN)
        assert red[i] == want_text, t
        assert n[i] == want_n, t


def test_redact_chain_counts_stage_input():
    """Hits are counted on the text as it looked when that preset ran:
    digits inside an email are consumed by the email replacement and
    must NOT be re-counted by the later number preset (= nested
    regexp_replace semantics, the contract the SQL oracle encodes)."""
    import pyarrow as pa

    red, n = textfn.redact_chain(pa.array(["a12@b.co x3"]),
                                 ("email", "number"))
    assert red.to_pylist() == ["<EMAIL> x#"]
    assert n.tolist() == [2]  # one email + one digit run, not three


_chain_text = st.text(alphabet=st.sampled_from(list(
    "ab9@.+-() 05#<>%_")), max_size=50)


@settings(deadline=None, max_examples=40)
@given(st.lists(st.one_of(st.none(), _chain_text),
                min_size=1, max_size=6))
def test_redact_chain_parity_fuzz(texts):
    """Arrow RE2 and DuckDB RE2 must agree on the full preset chain
    (text AND per-stage hit totals) for arbitrary strings over the
    preset alphabet, including strings already containing the
    replacement tokens."""
    import pyarrow as pa

    con = duckdb.connect()
    red, n = textfn.redact_chain(pa.array(texts, type=pa.string()),
                                 _CHAIN)
    red = red.to_pylist()
    for i, t in enumerate(texts):
        want_text, want_n = _duckdb_chain(con, t, _CHAIN)
        assert red[i] == want_text, t
        assert n[i] == want_n, t


def test_redact_events_gate_parity(ray_session, sf_dir):
    """Driver-gate simulation for redact_events_props at sf0.001."""
    import __ray_entry__ as e

    got = e.queries()["redact_events_props"](sf_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(e.oracle_sql()["redact_events_props"]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    got = got[cols].copy()
    got["redacted_hash_xor"] = got["redacted_hash_xor"].astype("int64",
                                                               errors="ignore")
    want = want[cols]
    want["redacted_hash_xor"] = want["redacted_hash_xor"].astype(
        "uint64").astype("int64", errors="ignore")
    got = got.sort_values(cols).reset_index(drop=True)
    want = want.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_span_scores(texts, k: int = 5):
    per_doc = []
    for t in texts:
        toks = textfn._WORD_RE.findall((t or "").lower())
        if len(toks) >= k:
            per_doc.append({" ".join(toks[j:j + k])
                            for j in range(len(toks) - k + 1)})
        elif toks:
            per_doc.append({" ".join(toks)})
        else:
            per_doc.append(set())
    counts: dict[str, int] = {}
    for sh in per_doc:
        for s in sh:
            counts[s] = counts.get(s, 0) + 1
    shared = {s for s, c in counts.items() if c >= 2}
    return {i: (len(sh), len(sh & shared))
            for i, sh in enumerate(per_doc) if sh}


@pytest.mark.parametrize("broadcast_max", [10**9, 0])
def test_span_dup_scores_both_routes(ray_session, broadcast_max):
    """Broadcast route and bucketed-groupby fallback (forced via
    broadcast_max=0) produce identical per-doc scores."""
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.stages.dedup import (
        span_dup_scores,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a quick brown fox jumps over a fence today",
        "the quick brown fox jumps over the lazy dog",
        "completely different words in this document here now",
        "tiny doc",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = span_dup_scores(rd.from_pandas(df).repartition(3), "doc_id",
                          "text", k=5,
                          broadcast_max=broadcast_max).to_pandas()
    got = {r.doc_id: (r.n_shingles, r.n_dup_shingles)
           for r in got.itertuples()}
    assert got == _brute_span_scores(texts)
    assert got[0][1] > 0 and got[3][1] == 0  # sanity: shared vs unique


def test_curation_v3_antijoin_route(ray_session, sf_dir):
    """Forcing flagged_broadcast_max=0 drives the distributed
    left_anti-join filter; results must equal the broadcast route."""
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q,
    )

    a = q.corpus_curation_v3(sf_dir)
    b = q.corpus_curation_v3(sf_dir, flagged_broadcast_max=0)
    pd.testing.assert_frame_equal(
        a.sort_values("lang").reset_index(drop=True),
        b.sort_values("lang").reset_index(drop=True))


def test_span_ops_unify_duplicate_ids_within_batch(ray_session):
    """Document identity is id_col: two rows with the same id inside a
    batch count as ONE document (matching the SQL oracle's DISTINCT),
    both for the histogram and the per-doc scores."""
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.stages.dedup import (
        dup_span_histogram, span_dup_scores,
    )

    span = "alpha beta gamma delta epsilon"
    df = pd.DataFrame({"doc_id": [7, 7, 9],
                       "text": [span, span + " tail word here",
                                "unrelated words entirely different set"]})
    hist = dup_span_histogram(rd.from_pandas(df), "doc_id", "text",
                              k=5).to_pandas()
    hist = dict(zip(hist["docs_sharing"], hist["n_shingles"]))
    # the shared span belongs to doc 7 twice -> docs_sharing == 1
    assert 2 not in hist
    scores = span_dup_scores(rd.from_pandas(df), "doc_id", "text",
                             k=5).to_pandas()
    row7 = scores[scores["doc_id"] == 7].iloc[0]
    assert row7["n_dup_shingles"] == 0  # no OTHER doc shares it
    assert row7["n_shingles"] == 4      # union of both rows' shingles
