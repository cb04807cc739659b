"""Deterministic web-pages fixture generator (FIXTURES.md §1-2).

Builds the BASELINE.json input_hint table pair — ``pages_source`` /
``pages_sink`` with columns (url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string) — plus a ``links`` table, all
seeded (seed=42 convention) with **recorded injected differences** so
tests can assert exact expectations (mock-data-generator analog,
``datachecker-mock-data``; diff classes mirror
``SliceCheckWorker.java:263-289``):

- ``K_ins`` urls present only in source  -> expected ``insert``
- ``K_del`` urls present only in sink    -> expected ``delete``
- ``K_upd`` urls with one mutated byte of ``text`` -> expected ``update``
- ``K_dup`` urls duplicated inside sink  -> expected uniqueness hits
- dangling ``links.dst_url``             -> expected referential hits

Domains are Zipf-skewed (hot domains exercise skew handling); html
lengths are log-normal with outliers (oversized-record batching).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["en", "de", "zh", "fr", "es", "it", "pt", "ru"])
LANG_P = np.array([0.45, 0.12, 0.12, 0.09, 0.08, 0.05, 0.05, 0.04])


@dataclass
class PagesSpec:
    n_rows: int = 10_000
    n_files: int = 8
    seed: int = 42
    n_domains: int = 500
    zipf_a: float = 1.3
    k_ins: int = 20     # only in source
    k_del: int = 15     # only in sink
    k_upd: int = 25     # text mutated in sink
    k_dup: int = 10     # urls duplicated inside sink
    html_mean: float = 9.0   # log-normal ln-mean (~8 KB)
    html_sigma: float = 1.0
    html_max: int = 262_144
    n_links: int = 0         # 0 => 2 * n_rows
    dangling_frac: float = 0.02
    drift_day: int = 5       # rows on this warc_ts day get shifted lang
                             # (the FIXTURES.md 'shifted partition');
                             # -1 disables


def _urls(rng: np.random.Generator, spec: PagesSpec) -> np.ndarray:
    dom_idx = np.minimum(rng.zipf(spec.zipf_a, spec.n_rows) - 1,
                         spec.n_domains - 1)
    doms = np.array([f"d{i:04d}.example.com" for i in range(spec.n_domains)])
    # unique path per row => urls unique before injected duplicates
    return np.array([f"https://{doms[d]}/p/{i:08x}"
                     for i, d in enumerate(dom_idx)], dtype=object)


def _text_for(urls: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic 'extracted text' per url — source/sink agree
    byte-for-byte unless a diff is injected (input_hint invariant)."""
    import zlib

    words = np.array([f"w{i:03d}" for i in range(1000)])
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        h = zlib.crc32(f"{u}|{seed}".encode())  # process-independent seed
        r = np.random.default_rng(h)
        n = int(r.integers(20, 200))
        out[i] = " ".join(words[r.integers(0, 1000, n)])
    return out


def build_pages(spec: PagesSpec) -> tuple[pd.DataFrame, pd.DataFrame, dict]:
    """Returns (source_df, sink_df, expected) without writing."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_rows
    urls = _urls(rng, spec)
    ts = (np.int64(1_700_000_000_000_000)
          + rng.integers(0, 30 * 86400 * 1_000_000, n))
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    if spec.drift_day >= 0:
        # shifted-lang "partition": one warc_ts day draws from an
        # inverted distribution -> expected per-partition drift flag
        day = ((ts - np.int64(1_700_000_000_000_000))
               // np.int64(86400 * 1_000_000)).astype(np.int64)
        shifted = day == spec.drift_day
        lang[shifted] = rng.choice(LANGS, size=int(shifted.sum()),
                                   p=LANG_P[::-1] / LANG_P.sum())
    text = _text_for(urls, spec.seed)
    hlen = np.minimum(rng.lognormal(spec.html_mean, spec.html_sigma, n)
                      .astype(np.int64) + 64, spec.html_max)
    # a few >=4x outliers to exercise oversized-record batching
    out_idx = rng.choice(n, size=max(1, n // 2000), replace=False)
    hlen[out_idx] = spec.html_max
    html = np.empty(n, dtype=object)
    for i in range(n):
        h = np.random.default_rng(int(hlen[i]) ^ (i * 2654435761 % 2**31))
        html[i] = h.bytes(int(hlen[i]))
    src = pd.DataFrame({"url": urls, "warc_ts": ts, "html": html,
                        "text": text, "lang": lang})

    # injected differences (disjoint row sets)
    idx = rng.permutation(n)
    ins_rows = idx[:spec.k_ins]
    upd_rows = idx[spec.k_ins:spec.k_ins + spec.k_upd]
    dup_rows = idx[spec.k_ins + spec.k_upd:
                   spec.k_ins + spec.k_upd + spec.k_dup]
    snk = src.drop(index=ins_rows).copy()          # missing at sink -> insert
    mut = src.loc[upd_rows].copy()
    mut["text"] = mut["text"] + "X"                # one-byte mutation -> update
    snk.loc[upd_rows[np.isin(upd_rows, snk.index)], "text"] = \
        mut["text"].loc[upd_rows[np.isin(upd_rows, snk.index)]]
    extra = src.loc[dup_rows].copy()               # duplicated urls in sink
    del_df = pd.DataFrame({
        "url": [f"https://dzz.example.com/only-sink/{i:06x}"
                for i in range(spec.k_del)],
        "warc_ts": ts[:spec.k_del],
        "html": [b"sink-only"] * spec.k_del,
        "text": [f"sink only text {i}" for i in range(spec.k_del)],
        "lang": ["en"] * spec.k_del,
    })
    snk = pd.concat([snk, extra, del_df], ignore_index=True)
    snk = snk.sample(frac=1.0, random_state=spec.seed).reset_index(drop=True)

    expected = {
        "insert_keys": sorted(src.loc[ins_rows, "url"].tolist()),
        "delete_keys": sorted(del_df["url"].tolist()),
        "update_keys": sorted(src.loc[upd_rows, "url"].tolist()),
        "dup_keys": sorted(extra["url"].tolist()),
        "n_source": len(src), "n_sink": len(snk),
    }
    return src, snk, expected


def build_links(pages: pd.DataFrame, spec: PagesSpec) -> tuple[pd.DataFrame, dict]:
    rng = np.random.default_rng(spec.seed + 1)
    n = spec.n_links or 2 * len(pages)
    src_urls = pages["url"].to_numpy()
    s = rng.choice(src_urls, size=n)
    d = rng.choice(src_urls, size=n).astype(object)
    n_dangle = int(n * spec.dangling_frac)
    dangle_idx = rng.choice(n, size=n_dangle, replace=False)
    for j, i in enumerate(dangle_idx):
        d[i] = f"https://gone.example.org/x/{j:06x}"
    anchors = np.array([f"anchor {i % 97}" for i in range(n)], dtype=object)
    links = pd.DataFrame({"src_url": s, "dst_url": d, "anchor": anchors})
    expected = {"n_links": n, "n_dangling": n_dangle,
                "dangling_urls": sorted({d[i] for i in dangle_idx})}
    return links, expected


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())])


def _write_sharded(df: pd.DataFrame, out_dir: str, n_files: int,
                   schema: pa.Schema | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    rows = t.num_rows
    per = max(1, (rows + n_files - 1) // n_files)
    for i in range(0, n_files):
        lo = i * per
        if lo >= rows:
            break
        pq.write_table(t.slice(lo, per),
                       os.path.join(out_dir, f"part-{i:05d}.parquet"))


def generate(base_dir: str, spec: PagesSpec | None = None) -> dict:
    """Generate pages_source/, pages_sink/, links/ + expected.json.

    Idempotent: if expected.json exists with the same spec, reuse.
    """
    spec = spec or PagesSpec()
    marker = os.path.join(base_dir, "expected.json")
    if os.path.exists(marker):
        with open(marker) as f:
            saved = json.load(f)
        if saved.get("spec") == asdict(spec):
            return saved
    src, snk, exp = build_pages(spec)
    links, lexp = build_links(src, spec)
    # regenerating under a DIFFERENT spec: clear stale shards first —
    # a previous spec with more files would otherwise leave orphan
    # part-*.parquet mixed into the new table (caught when a stale
    # 1M-page dir produced 1.5M rows and ~1M phantom duplicate urls)
    import shutil

    for sub in ("pages_source", "pages_sink", "links"):
        shutil.rmtree(os.path.join(base_dir, sub), ignore_errors=True)
    _write_sharded(src, os.path.join(base_dir, "pages_source"),
                   spec.n_files, PAGES_SCHEMA)
    _write_sharded(snk, os.path.join(base_dir, "pages_sink"),
                   spec.n_files, PAGES_SCHEMA)
    _write_sharded(links, os.path.join(base_dir, "links"), spec.n_files)
    out = {"spec": asdict(spec), **exp, **lexp}
    with open(marker, "w") as f:
        json.dump(out, f, indent=1)
    return out
