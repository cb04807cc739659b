"""Per-column canonicalization: typed Arrow column -> canonical bytes.

Re-expresses the reference's canonical-string type system
(``extract/task/functional/SimpleTypeHandlerFactory.java``,
``extract/task/ResultSetHandler.java:83-101`` — every native value is
converted to a canonical string so that two rows are equal iff their
canonical concatenations are byte-identical) for Arrow types, fully
vectorized with ``pyarrow.compute``:

==================  ==========================================
arrow type          canonical form
==================  ==========================================
null value          b"" (matches reference: null -> "" in the
                    digest concat, ``extract/util/HashHandler.java:56-59``)
string family       identity bytes
binary family       identity bytes (the reference hex-encodes only
                    because its transport is strings; raw bytes are
                    equality-equivalent and zero-copy)
bool                b"true" / b"false" (``SimpleTypeHandlerFactory.java:520``)
int / uint family   decimal string
decimal128/256      plain decimal string (``toPlainString`` analog)
float32/64          Arrow round-trippable shortest repr (injective per
                    bit pattern; the reference's scale-formatted form is
                    lossy across DBs — ours is strictly stronger)
date32/64           epoch-day / epoch-ms decimal string
time32/64           units-since-midnight decimal string
timestamp           epoch-micros decimal string (injective; the
                    reference's GMT+8 strftime is a display choice)
dictionary          decoded, then per value type
other (list/struct) JSON-ish str() fallback via cast-to-string
==================  ==========================================

Equality is what matters (byte-identical canonical concat <=> equal
row); exact display strings are our own convention.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Column separator inside a canonical row concat. The reference
# concatenates with no separator (collision-prone across column
# boundaries); we insert 0x1F (unit separator) which cannot appear in
# canonical numeric forms and is vanishingly rare in text/binary.
FIELD_SEP = b"\x1f"
# Composite-key splice, mirroring Constants.PRIMARY_DELIMITER "_#_"
# (common/constant/Constants.java:29).
KEY_SEP = "_#_"

_EMPTY = pa.scalar(b"", type=pa.large_binary())


def canonicalize_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonicalize one column to a ``large_binary`` array, nulls -> b""."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        arr = arr.dictionary_decode()
        t = arr.type
    if pa.types.is_large_binary(t):
        out = arr
    elif pa.types.is_binary(t) or pa.types.is_fixed_size_binary(t):
        out = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(t) or pa.types.is_string(t):
        out = arr.cast(pa.large_binary())
    elif pa.types.is_boolean(t):
        out = arr.cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_integer(t) or pa.types.is_decimal(t) or pa.types.is_floating(t):
        out = arr.cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_timestamp(t):
        out = arr.cast(pa.int64()).cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_date32(t):
        out = arr.cast(pa.int32()).cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_date64(t):
        out = arr.cast(pa.int64()).cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_time32(t):
        out = arr.cast(pa.int32()).cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_time64(t):
        out = arr.cast(pa.int64()).cast(pa.string()).cast(pa.large_binary())
    elif pa.types.is_null(t):
        out = pa.nulls(len(arr), type=pa.large_binary())
    else:
        # Slow fallback for nested types — off the hot path by design.
        out = pa.array(
            [None if v is None else str(v).encode() for v in arr.to_pylist()],
            type=pa.large_binary(),
        )
    if out.null_count:
        out = out.fill_null(_EMPTY)
    return out


def canonical_row_concat(
    table: pa.Table, columns: list[str] | None = None
) -> pa.Array:
    """Concatenate canonical column bytes in schema column order.

    Mirrors the reference's row digest input — canonical values joined
    in column order (``extract/util/HashHandler.java:37-61``) — with an
    explicit field separator for column-boundary safety.
    """
    cols = columns if columns is not None else table.column_names
    canon = [canonicalize_column(table.column(c)) for c in cols]
    if len(canon) == 1:
        return canon[0]
    sep = pa.scalar(FIELD_SEP, type=pa.large_binary())
    return pc.binary_join_element_wise(
        *canon, sep, null_handling="replace", null_replacement=b""
    )


def key_column(table: pa.Table, key_columns: list[str]) -> pa.Array:
    """Build the PK string column: canonical PK values joined with ``_#_``.

    Mirrors ``extract/task/ResultSetHashHandler.java:47-54`` (composite
    PKs spliced with the primary delimiter).
    """
    parts = []
    for c in key_columns:
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        if pa.types.is_large_string(t):
            s = col
        elif pa.types.is_string(t):
            s = col.cast(pa.large_string())
        else:
            s = canonicalize_column(col).cast(pa.large_string())
        if s.null_count:
            s = s.fill_null("")
        parts.append(s)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(
        *parts, pa.scalar(KEY_SEP, type=pa.large_string()),
        null_handling="replace", null_replacement="",
    )
