"""From-scratch byte-pair-encoding tokenizer with a SQL-replayable
training procedure.

The reference engine counts "rows per slice"; a training-data pipeline
needs token counts, which needs a tokenizer. This module provides one
built entirely from public BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): train on a word-
frequency table (max-pair-count merge order, lexicographic (left,
right) tie-break, so training is fully deterministic), encode as a
map-only lookup.

**The cross-engine parity trick**: a word's current tokenization is
represented as a sentinel-wrapped string ``\\x1e s1 \\x1f \\x1e s2
\\x1f ...`` (every symbol individually wrapped), so applying one merge
``(l, r)`` is exactly ``str.replace("\\x1el\\x1f\\x1er\\x1f",
"\\x1elr\\x1f")`` — and Python ``str.replace`` and DuckDB ``replace``
share left-to-right non-overlapping semantics, which IS BPE's greedy
within-word merge order (``aaaa`` + merge ``(a,a)`` -> ``aa aa``, not
``aa a a``). ``oracle_sql`` unrolls the training loop as one CTE chain
per merge (the ``neardup_components`` recursion-unrolling pattern), so
DuckDB replays training + encoding bit-for-bit with zero literals
shipped between the engines.

Token ids are the 1-based lexicographic dense rank over the final
distinct symbols (binary codepoint order on both engines). Because
training runs over the same corpus being encoded, every corpus word's
final representation IS its encoding — encoding is a broadcast dict
lookup. ``encode_word`` handles out-of-corpus words by replaying the
merge list in rank order (the standard BPE inference rule).

Scale notes (100 TB): the word-frequency table is built with per-block
Arrow partial counts merged by a ``groupby().sum``-shaped fold and a
``min_freq`` floor (Zipf makes the surviving vocabulary small and
driver-safe); the merge loop itself is O(vocab x merges) driver work
on that small table; encoding broadcasts the word->ids dict once via
``ray.put`` and streams.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

SYM_OPEN = "\x1e"   # record separator: opens one symbol
SYM_CLOSE = "\x1f"  # unit separator: closes one symbol
# explicit ASCII class on BOTH engines: Python re's \s is
# unicode-aware, RE2's is not — the declared splitter avoids the trap
SPLIT_PATTERN = r"[ \t\n\r]+"
_SPLIT_RE = re.compile(SPLIT_PATTERN)


def words_of(text: str | None) -> list[str]:
    """The declared pre-tokenizer: split on ASCII whitespace, drop
    empties and (defensively) words carrying a sentinel byte."""
    if not text:
        return []
    return [w for w in _SPLIT_RE.split(text)
            if w and SYM_OPEN not in w and SYM_CLOSE not in w]


def _rep_of(word: str) -> str:
    return "".join(f"{SYM_OPEN}{c}{SYM_CLOSE}" for c in word)


def _syms_of(rep: str) -> list[str]:
    if not rep:
        return []
    return rep[1:-1].split(SYM_CLOSE + SYM_OPEN)


def train_merges(word_freq: dict[str, int], n_merges: int,
                 ) -> tuple[list[tuple[str, str]], dict[str, list[str]]]:
    """The Sennrich training loop over a word-frequency table.

    Each round counts every adjacent symbol pair (weighted by word
    frequency, all adjacent positions), merges the (count DESC, left
    ASC, right ASC) winner everywhere, and stops early when no pairs
    remain. Returns (merge list in rank order, word -> final symbol
    list)."""
    reps = {w: _rep_of(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            s = _syms_of(reps[w])
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        l, r = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((l, r))
        pat = f"{SYM_OPEN}{l}{SYM_CLOSE}{SYM_OPEN}{r}{SYM_CLOSE}"
        new = f"{SYM_OPEN}{l}{r}{SYM_CLOSE}"
        reps = {w: rp.replace(pat, new) for w, rp in reps.items()}
    return merges, {w: _syms_of(rp) for w, rp in reps.items()}


@dataclass(frozen=True)
class BpeTokenizer:
    """A trained tokenizer: rank-ordered merges, symbol -> 1-based
    lexicographic id, and the training corpus's word -> ids map."""

    merges: tuple[tuple[str, str], ...]
    sym_id: dict[str, int]
    word_ids: dict[str, tuple[int, ...]]

    @classmethod
    def from_word_freq(cls, word_freq: dict[str, int],
                       n_merges: int) -> "BpeTokenizer":
        merges, word_syms = train_merges(word_freq, n_merges)
        syms = sorted({s for ss in word_syms.values() for s in ss})
        sym_id = {s: i + 1 for i, s in enumerate(syms)}
        word_ids = {w: tuple(sym_id[s] for s in ss)
                    for w, ss in word_syms.items()}
        return cls(tuple(merges), sym_id, word_ids)

    def encode_word(self, word: str) -> tuple[int, ...]:
        """Encode one word, including out-of-corpus words: replay the
        merge list in rank order (standard BPE inference). Symbols
        never seen in training get id 0 (<unk>)."""
        hit = self.word_ids.get(word)
        if hit is not None:
            return hit
        rep = _rep_of(word)
        for l, r in self.merges:
            pat = f"{SYM_OPEN}{l}{SYM_CLOSE}{SYM_OPEN}{r}{SYM_CLOSE}"
            if pat in rep:
                rep = rep.replace(pat, f"{SYM_OPEN}{l}{r}{SYM_CLOSE}")
        return tuple(self.sym_id.get(s, 0) for s in _syms_of(rep))

    def encode(self, text: str | None) -> list[int]:
        out: list[int] = []
        for w in words_of(text):
            out.extend(self.encode_word(w))
        return out

    def n_tokens(self, text: str | None) -> int:
        return len(self.encode(text))


def ids_md5(ids) -> str:
    """The declared id-sequence digest: md5 over comma-joined decimal
    ids (DuckDB: ``md5(string_agg(id, ',' ORDER BY ...))``)."""
    return hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()


def word_freq_from_dataset(ds, text_col: str = "text",
                           min_freq: int = 1) -> dict[str, int]:
    """Distributed word-frequency table: each block emits one small
    Arrow partial (word, n) via an in-block group fold; the driver
    merges the partials (vocabulary-bounded, not corpus-bounded) and
    applies the ``min_freq`` floor. At 100 TB the floor is what keeps
    the table driver-sized — Zipf's tail is exactly the words a BPE
    never merges anyway."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for w in words_of(t):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table({"word": list(cnt), "n": list(cnt.values())})

    wf: dict[str, int] = {}
    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for w, n in zip(b.column("word").to_pylist(),
                        b.column("n").to_pylist()):
            wf[w] = wf.get(w, 0) + n
    if min_freq > 1:
        wf = {w: n for w, n in wf.items() if n >= min_freq}
    return wf


def _oracle_cte_chain(n_merges: int, table: str, id_col: str,
                      text_col: str) -> str:
    """The shared WITH-chain: docs/word-frequency/rep0, one
    (syms/pairs/best/rep) block per merge rank, ending at
    ``rep{n_merges}`` (word -> final sentinel representation). Every
    oracle over the trained tokenizer (encode digests, token-count
    packing) appends its own tail to this chain."""
    so, sc = "chr(30)", "chr(31)"
    words = (f"list_filter(string_split_regex(coalesce({text_col},''),"
             f" '{SPLIT_PATTERN}'), w -> w <> '' AND NOT "
             f"regexp_matches(w, {so}||'|'||{sc}))")
    parts = [f"""WITH docs AS MATERIALIZED (
  SELECT {id_col}, {words} AS words FROM {table}
), wf AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(words) AS w FROM docs) GROUP BY 1
), rep0 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_transform(string_split(word, ''),
                c -> {so} || c || {sc}), (a, b) -> a || b) AS rep
  FROM wf
)"""]
    prev = "rep0"
    for k in range(n_merges):
        parts.append(f""", syms{k} AS MATERIALIZED (
  SELECT word, freq,
    string_split(substr(rep, 2, len(rep) - 2), {sc} || {so}) AS s
  FROM {prev}
), pairs{k} AS MATERIALIZED (
  SELECT l, r, sum(freq) AS cnt FROM (
    SELECT freq, s[i] AS l, s[i + 1] AS r FROM (
      SELECT freq, s, unnest(range(1, len(s))) AS i
      FROM syms{k} WHERE len(s) > 1
    )
  ) GROUP BY l, r
), best{k} AS MATERIALIZED (
  SELECT l, r FROM pairs{k} ORDER BY cnt DESC, l, r LIMIT 1
), rep{k + 1} AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN b.l IS NULL THEN rep ELSE
      replace(rep, {so} || b.l || {sc} || {so} || b.r || {sc},
              {so} || b.l || b.r || {sc}) END AS rep
  FROM {prev} LEFT JOIN best{k} b ON TRUE
)""")
        prev = f"rep{k + 1}"
    return "".join(parts)


def oracle_sql(n_merges: int, table: str = "documents",
               id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB SQL replaying training AND encoding bit-for-bit: the
    merge loop unrolled as one (syms/pairs/best/rep) CTE block per
    merge rank over the sentinel-string representation, then encode =
    explode words -> join final representations -> lexicographic-rank
    ids -> md5 of the comma-joined sequence. No data crosses between
    the engines — the oracle re-derives the merges from the same
    corpus."""
    so, sc = "chr(30)", "chr(31)"
    prev = f"rep{n_merges}"
    parts = [_oracle_cte_chain(n_merges, table, id_col, text_col)]
    parts.append(f""", final_syms AS (
  SELECT word, unnest(s) AS s, unnest(range(1, len(s) + 1)) AS si
  FROM (SELECT word,
    string_split(substr(rep, 2, len(rep) - 2), {sc} || {so}) AS s
    FROM {prev})
), vocab AS (
  SELECT s, CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS id
  FROM (SELECT DISTINCT s FROM final_syms)
), doc_words AS (
  SELECT {id_col}, unnest(words) AS w,
         unnest(range(1, len(words) + 1)) AS wi
  FROM docs
), tok AS (
  SELECT d.{id_col}, d.wi, fs.si, v.id
  FROM doc_words d
  JOIN final_syms fs ON fs.word = d.w
  JOIN vocab v ON v.s = fs.s
), agg AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
         md5(string_agg(id, ',' ORDER BY wi, si)) AS ids_md5
  FROM tok GROUP BY {id_col}
)
SELECT t.{id_col}, coalesce(a.n_tokens, 0) AS n_tokens,
       coalesce(a.ids_md5, md5('')) AS ids_md5
FROM {table} t LEFT JOIN agg a ON a.{id_col} = t.{id_col}
ORDER BY t.{id_col}""")
    return "".join(parts)


def oracle_vocab_sql(n_merges: int, table: str = "documents",
                     id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle exposing the TRAINING ARTIFACT itself: one row per merge
    rank (rank, lhs, rhs, merged) from the unrolled chain's best{k}
    selections — training-order parity checked directly, not only
    through encode digests."""
    chain = _oracle_cte_chain(n_merges, table, id_col, text_col)
    unions = " UNION ALL ".join(
        f"SELECT {k + 1} AS rank, l AS lhs, r AS rhs FROM best{k}"
        for k in range(n_merges))
    return chain + f""", merges AS ({unions})
SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, lhs || rhs AS merged
FROM merges ORDER BY rank"""


def oracle_pack_sql(n_merges: int, chunk: int,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for BPE-token-weighted sequence packing: the same
    training chain, then per-word token counts (symbols in the final
    representation), per-doc sums, and the integer-exact window prefix
    sum that ``stages/packing.pack_chunks`` computes distributed."""
    sc, so = "chr(31)", "chr(30)"
    prev = f"rep{n_merges}"
    chain = _oracle_cte_chain(n_merges, table, id_col, text_col)
    return chain + f""", wtok AS (
  SELECT word,
    len(string_split(substr(rep, 2, len(rep) - 2), {sc} || {so}))
      AS n FROM {prev}
), doc_tok AS (
  SELECT d.{id_col}, CAST(coalesce(sum(w.n), 0) AS BIGINT) AS n_tokens
  FROM (SELECT {id_col}, unnest(words) AS word FROM docs) d
  JOIN wtok w USING (word) GROUP BY d.{id_col}
), w AS (
  SELECT t.{id_col}, coalesce(dt.n_tokens, 0) AS n_tokens
  FROM {table} t LEFT JOIN doc_tok dt ON dt.{id_col} = t.{id_col}
), o AS (
  SELECT {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS "offset"
  FROM w
)
SELECT {id_col}, n_tokens, "offset",
       "offset" // {chunk} AS chunk_first,
       CASE WHEN n_tokens > 0
            THEN ("offset" + n_tokens - 1) // {chunk}
            ELSE "offset" // {chunk} END AS chunk_last
FROM o ORDER BY {id_col}"""
