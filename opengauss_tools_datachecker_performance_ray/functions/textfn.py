"""Vectorized text-analysis + dedup primitives for document pipelines.

North-rule / training-data extensions over the ``documents`` table:
language-ID heuristic, quality scoring, token counting, rolling-hash
fingerprints, shingling, MinHash and SimHash. Everything is batch-
oriented: one call absorbs a whole Arrow/pandas batch; per-row Python
is confined to the unavoidable variable-length shingle explode, with
the numeric inner loops in numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .hashing import hash64

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# Tiny per-language stopword profiles (public common-knowledge lists).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "pour"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "de", "por"},
    "it": {"il", "la", "che", "e", "di", "non", "un", "una", "per", "sono"},
}


def token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace/word-regex token count per document (BPE-ish proxy)."""
    return texts.fillna("").str.count(_WORD_RE).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality signals, one row per document."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_tokens = t.str.count(_WORD_RE).to_numpy(dtype=np.int64)
    n_punct = t.str.count(_PUNCT_RE).to_numpy(dtype=np.int64)
    denom = np.maximum(n_chars, 1)
    mean_wl = n_chars / np.maximum(n_tokens, 1)
    stop_en = t.str.lower().str.count(
        r"\b(?:" + "|".join(sorted(STOPWORDS["en"])) + r")\b"
    ).to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / denom,
        "stop_ratio": stop_en / np.maximum(n_tokens, 1),
        "mean_word_len": mean_wl,
    })


def quality_score(texts: pd.Series) -> np.ndarray:
    """Scalar [0,1] quality score from the heuristic features."""
    f = quality_features(texts)
    score = (
        np.clip(f["n_tokens"] / 200.0, 0, 1) * 0.4
        + np.clip(1.0 - f["punct_ratio"] * 4.0, 0, 1) * 0.3
        + np.clip(f["stop_ratio"] * 5.0, 0, 1) * 0.3
    )
    return score.to_numpy(dtype=np.float64)


def lang_id(texts: pd.Series) -> np.ndarray:
    """Stopword-profile language guess over {en,de,fr,es,it}, else 'und'."""
    t = texts.fillna("").str.lower()
    scores = np.zeros((len(t), len(STOPWORDS)), dtype=np.int64)
    langs = list(STOPWORDS)
    for j, lang in enumerate(langs):
        pat = r"\b(?:" + "|".join(sorted(STOPWORDS[lang])) + r")\b"
        scores[:, j] = t.str.count(pat).to_numpy(dtype=np.int64)
    best = scores.argmax(axis=1)
    out = np.array(langs, dtype=object)[best]
    out[scores.max(axis=1) == 0] = "und"
    return out


def fingerprint(texts: pd.Series) -> np.ndarray:
    """64-bit whole-document fingerprint (content hash) per row."""
    return hash64(texts.fillna("").to_numpy(dtype=object))


def md5_hash64(strings: np.ndarray) -> np.ndarray:
    """uint64 per string: low 64 bits of the md5 digest, matching
    DuckDB's ``md5_number_lower`` bit-for-bit (bytes 8..16 of the
    digest, little-endian — pinned empirically by test). A per-row
    Python loop, so ORACLE-PARITY use only: the fast vectorized
    ``hash64`` is the production shingle hash; this one exists so the
    simhash / minhash gate queries can be value-matched against a SQL
    oracle that computes the identical fingerprints."""
    import hashlib

    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(str(s).encode("utf-8", "surrogatepass")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


def shingle_hashes(texts: pd.Series, k: int = 5,
                   hash_fn=None) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingle hashes for a batch.

    Returns (doc_idx, shingle_hash): a flat explode of every document's
    shingles with the owning row index — the layout that lets MinHash
    run as scatter-min over the whole batch instead of per-row loops.
    ``hash_fn`` overrides the shingle hash (default ``hash64``; pass
    ``md5_hash64`` for SQL-oracle parity).
    """
    doc_idx: list[np.ndarray] = []
    shingles: list[str] = []
    for i, text in enumerate(texts.fillna("")):
        toks = _WORD_RE.findall(text.lower())
        if len(toks) < k:
            if toks:
                shingles.append(" ".join(toks))
                doc_idx.append(np.array([i]))
            continue
        sh = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        shingles.extend(sh)
        doc_idx.append(np.full(len(sh), i))
    if not shingles:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return (np.concatenate(doc_idx).astype(np.int64),
            (hash_fn or hash64)(np.array(shingles, dtype=object)))


_MERSENNE = np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(doc_idx: np.ndarray, sh_hash: np.ndarray, n_docs: int,
                       num_perm: int = 64, seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures via scatter-min."""
    a, b = minhash_params(num_perm, seed)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not len(sh_hash):
        return sig
    h = sh_hash.astype(np.uint64, copy=False)
    for j in range(num_perm):
        perm = (a[j] * h + b[j]) % _MERSENNE
        np.minimum.at(sig[:, j], doc_idx, perm)
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 band-bucket keys for LSH candidate grouping."""
    n_docs, num_perm = sig.shape
    assert num_perm % bands == 0
    r = num_perm // bands
    out = np.empty((n_docs, bands), dtype=np.uint64)
    for bidx in range(bands):
        chunk = sig[:, bidx * r:(bidx + 1) * r]
        acc = np.full(n_docs, np.uint64(1469598103934665603))  # FNV offset
        for c in range(r):
            acc = (acc ^ chunk[:, c]) * np.uint64(1099511628211)
        out[:, bidx] = acc
    return out


def simhash(texts: pd.Series, num_bits: int = 64,
            hash_fn=None) -> np.ndarray:
    """64-bit SimHash per document from word-unigram hashes.

    Accumulates per-bit vote counts with one ``bincount`` per bit —
    memory stays O(n_docs + n_shingles) instead of materializing the
    (n_shingles × 64) bit matrix (which is hundreds of MB per batch
    and thrashes when many tasks run concurrently). ``hash_fn``
    overrides the unigram hash (``md5_hash64`` for oracle parity).
    """
    doc_idx, h = shingle_hashes(texts, k=1, hash_fn=hash_fn)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not len(h):
        return out
    totals = np.bincount(doc_idx, minlength=n)  # shingles per doc
    for b in range(num_bits):
        ones = np.bincount(doc_idx, weights=((h >> np.uint64(b)) & np.uint64(1))
                           .astype(np.float64), minlength=n)
        # bit set when more ones than zeros (votes = 2*ones - total > 0)
        out |= (2 * ones > totals).astype(np.uint64) << np.uint64(b)
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1) \
        .sum(axis=1).astype(np.int64)


def winnowing_fingerprints(text: str, k: int = 5, window: int = 4,
                           hash_fn=None, lower: bool = True
                           ) -> np.ndarray:
    """Document fingerprint set via winnowing (Schleimer et al. 2003):
    rolling k-gram hashes, then the minimum hash of each sliding window
    — a position-robust fingerprint set whose overlap estimates local
    similarity (the 'rolling hash document fingerprinting' primitive).

    ``hash_fn`` defaults to the fast vectorized ``hash64``; the gate
    query passes ``md5_hash64`` so a SQL oracle can recompute the
    identical fingerprints. ``lower=False`` skips the internal Python
    ``str.lower`` for callers that already lowercased via Arrow
    ``utf8_lower`` (utf8proc), avoiding the rare Python-vs-utf8proc
    case-fold divergence."""
    t = (text or "")
    if lower:
        t = t.lower()
    if len(t) < k:
        return np.empty(0, dtype=np.uint64)
    grams = np.array([t[i:i + k] for i in range(len(t) - k + 1)],
                     dtype=object)
    h = (hash_fn or hash64)(grams)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    # sliding-window minimum via stride trick
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(h, window).min(axis=1)
    return np.unique(mins)


def fingerprint_overlap(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard overlap of two winnowing fingerprint sets."""
    if not len(a) and not len(b):
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(np.union1d(a, b))
    return inter / max(1, union)


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Character n-gram Jaccard similarity (pair verification kernel)."""
    sa = {a[i:i + n] for i in range(max(0, len(a) - n + 1))}
    sb = {b[i:i + n] for i in range(max(0, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


_URL_HOST_PATTERN = (r'^[A-Za-z][A-Za-z0-9+.\-]*://'
                     r'(?:[^/?#@]*@)?(?P<host>[^/?#:]+)')


def extract_domain(urls) -> "pa.Array":
    """Vectorized url -> lowercased host (RE2 via pyarrow
    ``extract_regex``, zero Python-object round trip). Null for rows
    that do not parse as scheme://[userinfo@]host... — feeds the
    hot-DOMAIN skew detection over the north-rule page table
    (``stages/skew.py``: a hot domain is the canonical skewed key at
    web scale)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, pattern=_URL_HOST_PATTERN)
    host = pc.utf8_lower(pc.struct_field(m, "host"))
    # extract_regex nulls whole non-matching rows; keep that null
    return host


# --- pattern scan / redaction (PII presets) ---------------------------
# ASCII-only patterns written to the COMMON subset of python re and
# RE2 (no lookaround, no backrefs, \b and \d only over ASCII input):
# the same literal string drives the Ray kernel and a DuckDB
# regexp_extract_all / regexp_replace oracle. On non-ASCII corpora
# python's unicode \d is wider than RE2's — keep inputs ASCII or swap
# in explicit [0-9] classes when oracle parity matters.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[- .]\d{3}[- .]\d{4}\b",
}


def pattern_counts(texts: pd.Series,
                   patterns: dict[str, str]) -> pd.DataFrame:
    """Non-overlapping match counts per row for each named pattern
    (one int64 column per pattern name). ``str.count`` scans
    left-to-right non-overlapping, the same contract as DuckDB's
    ``len(regexp_extract_all(text, pat))``. Nulls count as ""."""
    t = texts.fillna("")
    return pd.DataFrame(
        {name: t.str.count(pat).to_numpy(dtype=np.int64)
         for name, pat in patterns.items()},
        index=t.index)


def redact(texts: pd.Series, patterns: dict[str, str] | list[str],
           token: str = "[X]") -> pd.Series:
    """Replace every match of every pattern with ``token``. Patterns
    apply in iteration order over the previous pass's OUTPUT — the SQL
    analog is nested ``regexp_replace(..., 'g')`` in the same order,
    so a later pattern can in principle match across an earlier
    replacement; keep ``token`` free of pattern alphabet characters
    (the bracketed default is) when composing passes."""
    t = texts.fillna("")
    pats = patterns.values() if isinstance(patterns, dict) else patterns
    for pat in pats:
        t = t.str.replace(pat, token, regex=True)
    return t


# ---------------------------------------------------------------------------
# Normalization / Gopher-rule features / fixed-term tf (round-4 cont.)
#
# All three are Arrow-kernel vectorized and deliberately built from
# libraries DuckDB links too (utf8proc for NFC/lower, RE2 for regex),
# so each has a bit-parity SQL oracle in pipelines/queries.py.
# ---------------------------------------------------------------------------

# Complement of queries.TOKEN_RE after lower(): splitting on this and
# dropping empties yields exactly regexp_extract_all(lower(x), TOKEN_RE).
_TOKEN_SPLIT_RE = "[^a-z0-9_']+"

# The five Gopher-style English stopwords the filter requires (subset of
# STOPWORDS["en"], pinned as a tuple so the SQL literal cannot drift).
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")


def normalize_text(texts):
    """Canonical text normalization: NFC -> lowercase -> strip
    leading/trailing whitespace -> collapse interior whitespace runs
    to one space. Lower/trim/collapse are pyarrow kernels backed by
    the SAME libraries DuckDB uses (utf8proc for ``utf8_lower`` =
    ``lower``; RE2 for ``replace_substring_regex`` =
    ``regexp_replace(..., 'g')``), so a content hash of the result is
    byte-comparable with the SQL oracle.

    NFC deliberately does NOT use ``pc.utf8_normalize``: Arrow 16's
    kernel fails to COMPOSE (it leaves e + U+0301 decomposed, verified
    empirically), which would diverge from DuckDB's ``nfc_normalize``.
    Instead a vectorized RE2 scan finds rows containing any non-ASCII
    byte (NFC is the identity on pure ASCII) and only those rows take
    the per-row ``unicodedata.normalize`` path — the same
    fast-path/slow-path split as jsonfn's validating extractor.
    Takes and returns a pyarrow string array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pc.fill_null(texts, "")
    nonascii = pc.match_substring_regex(t, r"[^\x00-\x7F]")
    if pc.any(nonascii).as_py():
        import unicodedata

        arr = t.to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(
                nonascii.to_numpy(zero_copy_only=False)):
            arr[i] = unicodedata.normalize("NFC", arr[i])
        t = pa.array(arr, type=pa.string())
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"^\s+|\s+$", "")
    return pc.replace_substring_regex(t, r"\s+", " ")


def _explode_tokens(texts):
    """(tokens, parent_row_idx, token_char_lens) for a pyarrow string
    array — lowercased complement-split tokenization with empties
    dropped, i.e. exactly ``regexp_extract_all(lower(x), TOKEN_RE)``
    flattened. Fully vectorized (split + list_flatten +
    list_parent_indices); no per-row Python."""
    import pyarrow.compute as pc

    t = pc.utf8_lower(pc.fill_null(texts, ""))
    lists = pc.split_pattern_regex(t, _TOKEN_SPLIT_RE)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
    ne = lens > 0
    toks = flat.to_numpy(zero_copy_only=False)
    return toks[ne], parent[ne], lens[ne]


def gopher_features(texts) -> pd.DataFrame:
    """Integer Gopher-style quality-rule evidence (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", app. A1.1 — public heuristic family), one row
    per input row, all int64 so the filter thresholds stay exact via
    cross-multiplication: token count, total token chars (mean word
    length = sum/count without ever dividing), exact distinct-token
    count, stopword occurrences. Input is a pyarrow string array."""
    toks, parent, lens = _explode_tokens(texts)
    n = len(texts)
    n_words = np.bincount(parent, minlength=n).astype(np.int64)
    sum_wc = np.bincount(parent, weights=lens,
                         minlength=n).astype(np.int64)
    if len(toks):
        dd = pd.DataFrame({"p": parent, "t": toks}).drop_duplicates()
        n_distinct = np.bincount(dd["p"].to_numpy(),
                                 minlength=n).astype(np.int64)
        stop_mask = np.isin(toks, GOPHER_STOPWORDS)
        n_stop = np.bincount(parent[stop_mask],
                             minlength=n).astype(np.int64)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
        n_stop = np.zeros(n, dtype=np.int64)
    return pd.DataFrame({"n_words": n_words, "sum_word_chars": sum_wc,
                         "n_distinct_words": n_distinct,
                         "n_stopwords": n_stop})


def term_frequencies(texts, terms: tuple[str, ...]):
    """Exact token-equality term frequencies for a fixed query
    vocabulary — the inverted-index tf kernel behind keyword search.
    Returns ``(tf, dl)``: tf is (n_rows, n_terms) int64, dl the int64
    per-row total token count (same token definition as the packing /
    token-stats operators). Input is a pyarrow string array."""
    toks, parent, _ = _explode_tokens(texts)
    n = len(texts)
    dl = np.bincount(parent, minlength=n).astype(np.int64)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for j, term in enumerate(terms):
        m = toks == term
        if m.any():
            tf[:, j] = np.bincount(parent[m], minlength=n)
    return tf, dl


# --------------------------------------------------------------------------
# Regex redaction (PII scrubbing) — reference parity: the reference's
# table black/white regex rules (config/.../TableRegexRule) filter WHICH
# tables flow; a training-data engine additionally needs to scrub WHAT
# flows. Presets are RE2-syntax (no backrefs/lookaround) so the exact
# same pattern string runs on pyarrow (RE2) and DuckDB (RE2): parity is
# by construction, pinned by md5 tests in tests/test_textops.py.
# --------------------------------------------------------------------------

REDACT_PRESETS: dict[str, tuple[str, str]] = {
    # name -> (RE2 pattern, replacement)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d().-]{6,}\d", "<PHONE>"),
    "number": (r"[0-9]+", "#"),
}


def redact_chain(strings, presets=("email", "ipv4", "phone")):
    """Sequentially apply the named redaction presets to a pyarrow
    string array; returns ``(redacted, n_matches)`` where n_matches is
    the per-row int64 total of pattern hits counted on the text AS IT
    LOOKED when that preset ran (identical to nesting regexp_replace
    in SQL). Fully vectorized: one C++ RE2 pass per preset per batch,
    no Python per row. (Distinct from :func:`redact` above, the
    pandas-Series single-token variant used by the curate CLI — this
    one carries per-preset replacement tokens and hit counts.)"""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = pc.fill_null(strings, "")  # nulls scrub like '' (SQL coalesce)
    n = np.zeros(len(strings), dtype=np.int64)
    for name in presets:
        pat, rep = REDACT_PRESETS[name]
        n += pc.count_substring_regex(out, pat).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        out = pc.replace_substring_regex(out, pat, rep)
    return out, n
