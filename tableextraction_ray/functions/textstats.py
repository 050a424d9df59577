"""Text analysis over a documents table: token counts, quality features,
language ID, fingerprints, simhash, de-hyphenation, table classification.

All per-document transforms are ``map_batches`` over Arrow batches; the
string work itself is Python (regex/hashlib have no Arrow kernels) but
batched per block — no ``ds.map`` per row, no driver-side loops. Aggregates
pre-combine inside batches before the (tiny) groupby.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..textproc import classify_table, remove_hyphenated_words

STOPWORDS = ("the", "and", "of", "a", "in")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def fingerprint(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, fp) — md5 content fingerprint per document."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        fps = [_md5(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())}
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def token_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_stopwords, sum_token_len) — whitespace
    tokenization (Python str.split == trim + split on \\s+)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_tok, n_stop, sum_len = [], [], []
        for t in batch["text"].to_pylist():
            toks = t.split()
            n_tok.append(len(toks))
            n_stop.append(sum(1 for w in toks if w in STOPWORDS))
            sum_len.append(sum(len(w) for w in toks))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
                "sum_token_len": pa.array(sum_len, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def lang_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, sum_chars) — grouped corpus stats. Counts pre-combine
    per block via the groupby's internal partial aggregation."""
    out = ds.groupby("lang").aggregate(Count(), Sum("n_chars"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "lang": batch["lang"],
                "n_docs": batch["count()"].cast(pa.int64()),
                "sum_chars": batch["sum(n_chars)"].cast(pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, pred_lang) — n-gram-free heuristic language ID: 'cyr' when
    >30% of non-space characters are Cyrillic, else 'lat'."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            chars = [c for c in t if not c.isspace()]
            n_cyr = sum(1 for c in chars if "Ѐ" <= c <= "ӿ")
            preds.append("cyr" if chars and n_cyr * 10 > 3 * len(chars) else "lat")
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, type=pa.string())}
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def dehyphenate(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, clean_text) — the reference's OCR de-hyphenation regex
    (recognition.py:151-164) applied per document. Python lookaround
    semantics are not RE2-expressible, so this query has no SQL oracle."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "clean_text": pa.array(
                    [remove_hyphenated_words(t) for t in batch["text"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def classify_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, is_table_like) — the reference's fuzzy steel-spec keyword
    classifier (recognition.py:37-75) per document (positional char compare,
    not SQL-expressible)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "is_table_like": pa.array(
                    [classify_table(t) for t in batch["text"].to_pylist()],
                    type=pa.bool_(),
                ),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def simhash64(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash) — 64-bit SimHash document fingerprint over
    whitespace tokens (token hash = first 16 hex chars of md5). Near-dup
    docs differ in few bits; pairing by Hamming distance happens downstream
    (no SQL oracle: bitwise vote loop)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            votes = [0] * 64
            for w in t.split():
                h = int(_md5(w)[:16], 16)
                for b in range(64):
                    votes[b] += 1 if (h >> b) & 1 else -1
            sh = 0
            for b in range(64):
                if votes[b] > 0:
                    sh |= 1 << b
            out.append(f"{sh:016x}")
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")
