"""Vectorized JSON field extraction over string columns.

Web-scale corpora carry JSON sidecar metadata per record (the
``events.props`` shape); pipelines need typed field extraction without
a per-row ``json.loads``. ``extract_int`` takes a two-tier route:

- fast path: one compiled VALIDATING regex over the whole column
  (pandas ``str.match`` — vectorized C) accepting only syntactically
  valid FLAT single-level objects of string-keyed scalar values, then
  a last-occurrence strict-integer extraction and an exact Arrow
  string->int64 cast (never float staging — ints beyond 2^53 stay
  exact);
- slow path: any row failing the flat validator falls back to
  ``json.loads`` — exact JSON semantics, paid only for the rare rows.

Value semantics are STRICT JSON integers: the field must hold a JSON
integer literal (no leading zeros), else null. This intentionally
diverges from SQL's ``TRY_CAST(json_extract_string(...) AS BIGINT)``,
which also coerces quoted numbers (``"9"`` -> 9) and rounds floats
(9.5 -> 10); the oracle queries use integer-valued props where both
agree, and the divergences are pinned by test. Duplicate keys resolve
last-wins on both paths (matching ``json.loads``; DuckDB's
``json_extract`` takes the first — also pinned).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_INT64_MIN, _INT64_MAX = -(2 ** 63), 2 ** 63 - 1

_NUM = r'-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?'
_STR = r'"(?:[^"\\\x00-\x1f]|\\.)*"'
_VAL = f'(?:{_STR}|{_NUM}|true|false|null)'
_PAIR = f'{_STR}\\s*:\\s*{_VAL}'
# a syntactically valid flat object: string keys, scalar values only
_FLAT_RE = re.compile(
    f'^\\{{\\s*(?:{_PAIR}(?:\\s*,\\s*{_PAIR})*\\s*)?\\}}$')


def _key_re(key: str) -> re.Pattern:
    # leading greedy .* -> LAST occurrence wins (json.loads parity on
    # duplicate keys); strict JSON integer grammar (no leading zeros)
    return re.compile(
        r'.*[{,]\s*"' + re.escape(key)
        + r'"\s*:\s*(-?(?:0|[1-9]\d*))\s*[,}]')


def _safe_int(x) -> int | None:
    if not isinstance(x, str):
        return None
    v = int(x)
    return v if _INT64_MIN <= v <= _INT64_MAX else None


def extract_int(arr, key: str) -> pa.Array:
    """int64 value of ``key`` per row, null when absent / non-integer /
    malformed / out of int64 range. Accepts a pyarrow string array;
    returns pa.int64()."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pd.Series(arr.to_pandas())
    res = np.zeros(len(s), dtype=np.int64)
    has = np.zeros(len(s), dtype=bool)
    valid = s.notna()
    # any backslash (escaped keys like "k", escaped quotes) goes
    # to the exact slow path — the literal key regex cannot see
    # through JSON escapes (review finding; escapes are rare in
    # machine-written sidecars, so the fast path keeps its coverage)
    flat = (valid & s.str.match(_FLAT_RE)
            & ~s.str.contains("\\", regex=False, na=True)).to_numpy()
    if flat.any():
        # duplicate occurrences of the quoted key (e.g. '{"k":1,"k":"x"}')
        # go to the exact slow path: the greedy last-wins regex backtracks
        # past a non-integer last value and would return the EARLIER
        # integer, diverging from json.loads last-wins (advice finding).
        # Counting the quoted key is conservative (a key echoed inside a
        # string value also routes slow) — correctness over speed there.
        # Scanned over the flat subset only, not the whole series.
        ndup = s[flat].str.count(re.escape(f'"{key}"')).to_numpy()
        flat[np.flatnonzero(flat)[ndup > 1]] = False
    if flat.any():
        got = s[flat].str.extract(_key_re(key), expand=False)
        sa = pa.array(got.where(got.notna(), None), type=pa.string())
        try:
            ia = pc.cast(sa, pa.int64())
        except pa.ArrowInvalid:  # a value beyond int64 -> per-row
            ia = pa.array([_safe_int(x) for x in got], pa.int64())
        res[flat] = ia.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        has[flat] = pc.is_valid(ia).to_numpy(zero_copy_only=False)
    for i in np.nonzero((valid.to_numpy() & ~flat))[0]:
        try:
            v = json.loads(s.iloc[i])
        except (ValueError, TypeError):
            continue
        if isinstance(v, dict):
            val = v.get(key)
            if isinstance(val, bool) or not isinstance(val, int):
                continue
            if _INT64_MIN <= val <= _INT64_MAX:
                res[i] = val
                has[i] = True
    return pa.array(res, pa.int64(), mask=~has)
