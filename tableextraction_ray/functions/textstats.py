"""Text analysis over a documents table: token counts, quality features,
language ID, fingerprints, simhash, de-hyphenation, table classification.

All per-document transforms are ``map_batches`` over Arrow batches; the
string work itself is Python (regex/hashlib have no Arrow kernels) but
batched per block — no ``ds.map`` per row, no driver-side loops. Aggregates
pre-combine inside batches before the (tiny) groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..textproc import classify_table, remove_hyphenated_words

STOPWORDS = ("the", "and", "of", "a", "in")

# Shared ASCII-whitespace tokenizer: maximal runs of non-[ \t\n\r\v\f]
# characters. Python's str.split()/isspace() treat UNICODE whitespace
# (U+00A0, U+0085, ...) as separators but DuckDB's RE2 does not, so every
# token boundary in this module (and dedup shingling) goes through this
# explicit class — mirrored literally in the oracle's
# regexp_extract_all(text, '[^ \t\n\r\v\f]+').
_TOKEN_SPLIT_RE = None
_SPACE_RE = None


def ascii_tokens(text: str) -> list[str]:
    global _TOKEN_SPLIT_RE
    if _TOKEN_SPLIT_RE is None:
        import re

        _TOKEN_SPLIT_RE = re.compile(f"[^{SPACE_CLASS}]+")
    return _TOKEN_SPLIT_RE.findall(text)


def _space_re():
    """Compiled [SPACE_CLASS] matcher (ASCII whitespace only)."""
    global _SPACE_RE
    if _SPACE_RE is None:
        import re

        _SPACE_RE = re.compile(f"[{SPACE_CLASS}]")
    return _SPACE_RE


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
    """(doc_id, n_tokens, n_stopwords, sum_token_len) — ASCII-whitespace
    tokenization (shared ``ascii_tokens`` contract, oracle-identical)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_tok, n_stop, sum_len = [], [], []
        for t in batch["text"].to_pylist():
            toks = ascii_tokens(t)
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
        space_re = _space_re()
        for t in batch["text"].to_pylist():
            chars = space_re.sub("", t)
            n_cyr = sum(1 for c in chars if "Ѐ" <= c <= "ӿ")
            preds.append("cyr" if chars and n_cyr * 10 > 3 * len(chars) else "lat")
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, type=pa.string())}
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def dehyphenate(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, clean_text) — the reference's OCR de-hyphenation regex
    (recognition.py:151-164) applied per document. The Python lookarounds
    are not RE2-expressible directly, but the oracle replays them
    lookaround-free (split on ' ?- ?', rejoin conditioned on the neighbor
    char classes), so this query is hash-checked."""

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
    classifier (recognition.py:37-75) per document. The positional char
    compare replays exactly in SQL (cross-multiplied error ratio, f >= 2
    confidence gate), so this query is hash-checked."""

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


# Shared character classes for quality scoring — mirrored literally in the
# DuckDB oracle regexes so counts match bit-for-bit. Explicit ASCII space
# class (not \s): Python's \s includes unicode spaces, RE2's doesn't.
ALPHA_CLASS = "A-Za-zЀ-ӿ"
DIGIT_CLASS = "0-9"
SPACE_CLASS = " \\t\\n\\r\\v\\f"
# BPE-ish segmentation: letter runs | digit runs | non-space symbol runs.
TOKEN_REGEX = (
    f"[{ALPHA_CLASS}]+|[{DIGIT_CLASS}]+|[^{ALPHA_CLASS}{DIGIT_CLASS}{SPACE_CLASS}]+"
)


def quality_score(
    ds: ray.data.Dataset, passthrough: tuple[str, ...] = ()
) -> ray.data.Dataset:
    """(doc_id, n_chars_t, alpha_fp6, digit_fp6, punct_fp6, stop_fp6,
    mean_tok_len_fp6) — document quality features: character-class ratios,
    stopword ratio and mean whitespace-token length, all 1e6 fixed-point
    via the shared floor(x*1e6+0.5) formula (IEEE-double deterministic on
    integer inputs, so the SQL oracle hashes identically). ``passthrough``
    columns from the input ride along unchanged (e.g. source for the
    per-source rollup)."""
    import re

    from . import fp

    alpha_re = re.compile(f"[{ALPHA_CLASS}]")
    digit_re = re.compile(f"[{DIGIT_CLASS}]")
    space_re = re.compile(f"[{SPACE_CLASS}]")

    def ratio(a: int, total: int) -> int:
        return fp(a / total, 6) if total else 0

    def batch_fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "n_chars_t": [], "alpha_fp6": [], "digit_fp6": [],
            "punct_fp6": [], "stop_fp6": [], "mean_tok_len_fp6": [],
        }
        for t in batch["text"].to_pylist():
            total = len(t)
            n_alpha = len(alpha_re.findall(t))
            n_digit = len(digit_re.findall(t))
            n_space = len(space_re.findall(t))
            toks = ascii_tokens(t)
            n_stop = sum(1 for w in toks if w in STOPWORDS)
            sum_len = sum(len(w) for w in toks)
            cols["n_chars_t"].append(total)
            cols["alpha_fp6"].append(ratio(n_alpha, total))
            cols["digit_fp6"].append(ratio(n_digit, total))
            cols["punct_fp6"].append(ratio(total - n_alpha - n_digit - n_space, total))
            cols["stop_fp6"].append(ratio(n_stop, len(toks)))
            cols["mean_tok_len_fp6"].append(ratio(sum_len, len(toks)))
        out = {"doc_id": batch["doc_id"]}
        out.update({k: pa.array(v, type=pa.int64()) for k, v in cols.items()})
        for c in passthrough:
            out[c] = batch[c]
        return pa.Table.from_pydict(out)

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def token_regex_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens, n_bpe_types) — BPE-ish regex token count and
    distinct-type count (letter runs / digit runs / symbol runs), the
    tokenizer-granularity complement of whitespace token_stats."""
    import re

    tok_re = re.compile(TOKEN_REGEX)

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_tok, n_typ = [], []
        for t in batch["text"].to_pylist():
            toks = tok_re.findall(t)
            n_tok.append(len(toks))
            n_typ.append(len(set(toks)))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(n_tok, type=pa.int64()),
                "n_bpe_types": pa.array(n_typ, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def simhash64(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash) — 64-bit SimHash document fingerprint over
    ASCII-whitespace tokens (token hash = first 8 md5 bytes as a big-endian
    uint64). Near-dup docs differ in few bits; pairing by Hamming distance
    happens downstream. Hash-verified against a DuckDB bit-ops oracle
    (per-bit unnest + majority vote, __ray_entry__.oracle_sql)."""

    import numpy as np

    def batch_fn(batch: pa.Table) -> pa.Table:
        from collections import Counter

        # Token-hash cache shared across the batch: natural text repeats
        # its vocabulary heavily, and the bit-vote weighs MULTIPLICITY, so
        # hashing each distinct token once and weighting its bit row by
        # the count is bit-identical to hashing every occurrence
        # (ones = sum_tokens bit = sum_distinct count*bit) at a fraction
        # of the md5 calls.
        cache: dict[str, bytes] = {}

        def h8(w: str) -> bytes:
            v = cache.get(w)
            if v is None:
                v = cache[w] = hashlib.md5(w.encode("utf-8")).digest()[:8][::-1]
            return v

        out = []
        for t in batch["text"].to_pylist():
            toks = ascii_tokens(t)
            if not toks:
                out.append(f"{0:016x}")
                continue
            counts = Counter(toks)
            # One md5 per DISTINCT token, then a count-weighted vectorized
            # bit-vote: unpack the first 8 digest bytes to a
            # (n_distinct, 64) bit matrix; weighted column sums > n/2 set
            # the simhash bit. Bit order matches the scalar
            # `(h >> b) & 1` convention (LSB-first).
            digests = np.frombuffer(
                b"".join(h8(w) for w in counts), dtype=np.uint8
            ).reshape(len(counts), 8)
            bits = np.unpackbits(digests, axis=1, bitorder="little")
            weights = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            ones = weights @ bits
            sh_bits = (2 * ones > len(toks)).astype(np.uint8)
            sh = int.from_bytes(
                np.packbits(sh_bits, bitorder="little").tobytes(), "little"
            )
            out.append(f"{sh:016x}")
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def split_assign(
    ds: ray.data.Dataset,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split",
) -> ray.data.Dataset:
    """(doc_id, bucket, split) — deterministic train/val/test assignment:
    bucket = first 8 hex digits of md5(salt:doc_id) mod 100. Content-hash
    splitting is the only split that survives re-partitioning, resumes and
    corpus growth at 100 TB (row-number splits shift when any shard
    changes); salt isolates independent splits. Pure per-row map — no
    shuffle, no state. Oracle: identical md5 expression in DuckDB."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = [
            int(_md5(f"{salt}:{d}")[:8], 16) % 100 for d in ids
        ]
        split = [
            "test" if b < test_pct else ("val" if b < test_pct + val_pct else "train")
            for b in buckets
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(buckets, type=pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def normalize_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, norm_text, n_norm_chars) — canonical text normalization for
    dedup/fingerprint keys: lowercase (ASCII), strip non-alphanumeric to
    spaces, collapse whitespace runs, trim. The standard pre-pass before
    exact dedup so trivially-reformatted copies collide. Vectorized-safe
    per-row map, ASCII discipline shared with the oracle (Python
    str.lower() on ASCII == DuckDB lower())."""
    def batch_fn(batch: pa.Table) -> pa.Table:
        out = [normalize_string(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "norm_text": pa.array(out, type=pa.string()),
                "n_norm_chars": pa.array([len(t) for t in out], type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")



_NORM_RES = None


def normalize_string(t: str) -> str:
    """The pure normalization kernel behind normalize_text (exposed for
    direct reuse and property tests): lowercase, non-alphanumerics to
    spaces, whitespace runs collapsed, trimmed."""
    global _NORM_RES
    if _NORM_RES is None:
        import re

        _NORM_RES = (
            re.compile(f"[^{ALPHA_CLASS}{DIGIT_CLASS}{SPACE_CLASS}]"),
            re.compile(f"[{SPACE_CLASS}]+"),
        )
    non_alnum, spaces = _NORM_RES
    return spaces.sub(" ", non_alnum.sub(" ", t.lower())).strip(" ")


def token_freq(ds: ray.data.Dataset, k: int = 50) -> ray.data.Dataset:
    """(token, n) — the corpus-wide top-k most frequent tokens. The
    canonical vocabulary-building pass, shuffle-disciplined: each batch
    pre-counts its tokens into (token, count) partials (a batch of 10^4
    docs collapses to ~vocab-size rows), the groupby sums partials, and
    only the global top-k leaves the aggregate. Total order (n desc,
    token asc) makes the k-boundary deterministic for the oracle."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(ascii_tokens(t))
        return pa.Table.from_pydict(
            {
                "token": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"token": batch["token"], "n": batch["sum(n)"].cast(pa.int64())}
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def redact_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, redacted, n_redactions) — scrub URLs, emails and long digit
    runs (phone/account-shaped) to fixed placeholder tokens, in that order.
    The standard PII/link-stripping pass before training-data release; all
    three patterns are RE2-safe (no lookaround) so the DuckDB oracle runs
    the identical replacements."""
    import re

    pats = [
        (re.compile(r"https?://[^ \t\n\r\v\f]+"), "<URL>"),
        (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"), "<EMAIL>"),
        (re.compile(r"[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"), "<NUM>"),
    ]

    def batch_fn(batch: pa.Table) -> pa.Table:
        out, counts = [], []
        for t in batch["text"].to_pylist():
            n = 0
            for rx, token in pats:
                t, c = rx.subn(token, t)
                n += c
            out.append(t)
            counts.append(n)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "redacted": pa.array(out, type=pa.string()),
                "n_redactions": pa.array(counts, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset, k: int = 5, salt: str = "sample"
) -> ray.data.Dataset:
    """(source, doc_id, rk) — k documents per source group, chosen by
    deterministic md5 priority (the eval-set construction primitive:
    reproducible across runs, partitionings and corpus growth within a
    group, unlike reservoir sampling which depends on traversal order).
    Per-batch pre-pruning keeps at most k rows per (block, source) before
    the groupby, so the shuffle moves O(k x sources x blocks), never the
    corpus. Oracle: ROW_NUMBER() over the same md5 ordering."""

    def prune(batch: pa.Table) -> pa.Table:
        by_src: dict[str, list[tuple[str, int]]] = {}
        for src, doc_id in zip(
            batch["source"].to_pylist(), batch["doc_id"].to_pylist()
        ):
            by_src.setdefault(src, []).append((_md5(f"{salt}:{doc_id}"), doc_id))
        srcs, prios, ids = [], [], []
        for src, rows in by_src.items():
            for prio, doc_id in sorted(rows)[:k]:  # local top-k by priority
                srcs.append(src)
                prios.append(prio)
                ids.append(doc_id)
        return pa.Table.from_pydict(
            {
                "source": pa.array(srcs, type=pa.string()),
                "prio": pa.array(prios, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group["prio"].to_pylist(), group["doc_id"].to_pylist())
        )[:k]
        return pa.Table.from_pydict(
            {
                "source": pa.array(
                    [group["source"][0].as_py()] * len(rows), type=pa.string()
                ),
                "doc_id": pa.array([d for _, d in rows], type=pa.int64()),
                "rk": pa.array(range(1, len(rows) + 1), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pick, batch_format="pyarrow")
    )


def repetition_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, top_bigram_char_fp6, dup_trigram_char_fp6) —
    the Gopher/MassiveText repetition quality signals (Rae et al. 2021,
    Table A1) over the ASCII-whitespace token contract:

    - top_bigram_char_fp6: fraction of the document's characters covered
      by occurrences of its MOST FREQUENT word 2-gram (count ties break
      to the lexicographically smallest gram), where one occurrence
      covers len(w1) + 1 + len(w2) characters.
    - dup_trigram_char_fp6: fraction of characters covered by word
      3-grams that occur MORE THAN ONCE (sum over duplicated grams of
      count * gram length; overlaps counted per occurrence, so the value
      may exceed 1e6 for degenerate texts — the contract is deterministic
      arithmetic, not a probability).

    Both are 1e6 fixed-point via the shared floor(x*1e6+0.5) formula on
    integer-exact inputs, so the DuckDB oracle hashes identically. Pure
    per-row map — no shuffle, no state; the repetition gate a
    training-data pipeline applies alongside quality_score."""
    from collections import Counter

    from . import fp

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_toks, top_bi, dup_tri = [], [], []
        for t in batch["text"].to_pylist():
            toks = ascii_tokens(t)
            total = len(t)
            n_toks.append(len(toks))
            if len(toks) < 2 or total == 0:
                top_bi.append(0)
            else:
                c2 = Counter(
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                )
                # max count, ties to lexicographically smallest gram
                g, n = min(c2.items(), key=lambda kv: (-kv[1], kv[0]))
                top_bi.append(fp(n * len(g) / total, 6))
            if len(toks) < 3 or total == 0:
                dup_tri.append(0)
            else:
                c3 = Counter(
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                )
                covered = sum(
                    n * len(g) for g, n in c3.items() if n > 1
                )
                dup_tri.append(fp(covered / total, 6))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_toks, type=pa.int64()),
                "top_bigram_char_fp6": pa.array(top_bi, type=pa.int64()),
                "dup_trigram_char_fp6": pa.array(dup_tri, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def char_budget_prefix(
    ds: ray.data.Dataset, budget: int = 40_000
) -> ray.data.Dataset:
    """(doc_id, n_chars, cum_chars) — the doc_id-ordered PREFIX of the
    corpus whose running character total stays within ``budget``
    (cum_chars is the inclusive running sum; a doc is kept iff its
    cum_chars <= budget). This is the budget-subsetting op of a training
    run ("take documents in canonical order until N tokens"), and under
    the hood a DISTRIBUTED ORDERED PREFIX SUM — the engine primitive:

    1. sort by doc_id (range partition; at 100 TB the corpus is already
       id-partitioned on storage and the sort is a no-op read order),
       materialize so block boundaries are stable;
    2. pass 1 reads ONE (first_doc_id, block_sum) pair per BLOCK
       (map_batches with batch_size=None = one batch per block) — the
       driver holds one tiny row per block, never per row;
    3. the driver prefix-sums the per-block totals into per-block
       offsets keyed by first_doc_id and broadcasts them via ray.put;
    4. pass 2 adds offset + within-block cumsum and filters. Rows never
       leave their block; the only driver state is O(#blocks).

    Oracle: SUM(n_chars) OVER (ORDER BY doc_id) window."""
    import numpy as np

    import ray as _ray

    sorted_ds = ds.sort("doc_id").materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"first_id": pa.array([], type=pa.int64()),
                 "block_sum": pa.array([], type=pa.int64())}
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = int(batch["n_chars"].to_numpy(zero_copy_only=False).sum())
        return pa.Table.from_pydict(
            {
                "first_id": pa.array([int(ids.min())], type=pa.int64()),
                "block_sum": pa.array([s], type=pa.int64()),
            }
        )

    metas = sorted(
        sorted_ds.map_batches(
            block_meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: r["first_id"],
    )
    offsets: dict[int, int] = {}
    run = 0
    for m in metas:
        offsets[m["first_id"]] = run
        run += m["block_sum"]
    off_ref = _ray.put(offsets)

    def add_cumsum(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_chars": pa.array([], type=pa.int64()),
                 "cum_chars": pa.array([], type=pa.int64())}
            )
        off = _ray.get(off_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(nc) + off[int(ids.min())]
        keep = cum <= budget
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64), type=pa.int64()),
                "n_chars": pa.array(nc[keep], type=pa.int64()),
                "cum_chars": pa.array(cum[keep], type=pa.int64()),
            }
        )

    return sorted_ds.map_batches(
        add_cumsum, batch_format="pyarrow", batch_size=None
    )


def shard_plan(
    ds: ray.data.Dataset, target_chars: int = 20_000
) -> ray.data.Dataset:
    """(shard_id, n_docs, n_chars, first_doc_id, last_doc_id) — the output
    SHARD MANIFEST for a resumable write: documents in canonical doc_id
    order are packed greedily into shards of ~``target_chars`` characters
    (shard_id = exclusive-prefix-sum(n_chars) // target_chars), and one
    manifest row per shard records its extent. This is the planner behind
    "write partitioned Parquet, one directory per key range, so a failed
    run can skip finished partitions": a restarted job diffs the manifest
    against the sink's committed shard dirs and re-runs only the missing
    shard_id ranges (the same anti-join shape as state/checkpoint.py).

    Shape: the char_budget_prefix distributed ordered prefix sum (one
    (first_doc_id, block_sum) row per BLOCK to the driver, O(#blocks)
    driver state), then per-block per-shard PARTIAL manifest rows (shard
    ids are monotone within a sorted block, so first/last are in-block
    min/max) and ONE tiny keyed groupby over ~#shards + #blocks partial
    rows — document rows never leave their block.

    Oracle: exclusive SUM(n_chars) OVER (ORDER BY doc_id) // target,
    GROUP BY shard_id."""
    import numpy as np

    import ray as _ray
    from ray.data.aggregate import Max, Min, Sum

    sorted_ds = ds.sort("doc_id").materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"first_id": pa.array([], type=pa.int64()),
                 "block_sum": pa.array([], type=pa.int64())}
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = int(batch["n_chars"].to_numpy(zero_copy_only=False).sum())
        return pa.Table.from_pydict(
            {
                "first_id": pa.array([int(ids.min())], type=pa.int64()),
                "block_sum": pa.array([s], type=pa.int64()),
            }
        )

    metas = sorted(
        sorted_ds.map_batches(
            block_meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: r["first_id"],
    )
    offsets: dict[int, int] = {}
    run = 0
    for m in metas:
        offsets[m["first_id"]] = run
        run += m["block_sum"]
    off_ref = _ray.put(offsets)

    PARTIAL = pa.schema(
        [
            ("shard_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_chars", pa.int64()),
            ("first_doc_id", pa.int64()),
            ("last_doc_id", pa.int64()),
        ]
    )

    def block_partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pylist([], schema=PARTIAL)
        off = _ray.get(off_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.cumsum(nc) - nc + off[int(ids.min())]
        shard = excl // target_chars
        # shard ids are nondecreasing over the sorted block: segment-reduce
        first_idx = np.flatnonzero(np.r_[True, shard[1:] != shard[:-1]])
        last_idx = np.r_[first_idx[1:] - 1, len(shard) - 1]
        seg_chars = np.add.reduceat(nc, first_idx)
        return pa.Table.from_pydict(
            {
                "shard_id": pa.array(shard[first_idx], type=pa.int64()),
                "n_docs": pa.array(
                    last_idx - first_idx + 1, type=pa.int64()
                ),
                "n_chars": pa.array(seg_chars, type=pa.int64()),
                "first_doc_id": pa.array(ids[first_idx], type=pa.int64()),
                "last_doc_id": pa.array(ids[last_idx], type=pa.int64()),
            },
            schema=PARTIAL,
        )

    return (
        sorted_ds.map_batches(
            block_partials, batch_format="pyarrow", batch_size=None
        )
        .groupby("shard_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Min("first_doc_id", alias_name="first_doc_id"),
            Max("last_doc_id", alias_name="last_doc_id"),
        )
    )


def epoch_shuffle(ds: ray.data.Dataset, epoch: int = 0) -> ray.data.Dataset:
    """(doc_id, rank) — the deterministic global training-order
    permutation for one epoch: documents ordered by the 60-bit integer
    parse of md5(f"epoch{epoch}:{doc_id}") (ties broken by doc_id),
    rank = 1-based position in that order. Content-hash epoch shuffling
    is reproducible across reruns, resumes and repartitioning — the
    property a 100 TB training job needs from its data order — and each
    epoch is an independent permutation via the salt.

    Shape: one hash map, ONE range-partitioning sort on the (int, int)
    key pair, then global ranks via the same block-offset pattern as
    char_budget_prefix (one (first_key, row_count) row per block to the
    driver; O(#blocks) driver state; rows never leave their block).

    Oracle: ROW_NUMBER() OVER (ORDER BY same-hash-expression, doc_id)."""
    import numpy as np

    import ray as _ray

    salt = f"epoch{epoch}:"

    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ks = [int(_md5(f"{salt}{d}")[:15], 16) for d in ids]
        return pa.Table.from_pydict(
            {
                "skey": pa.array(ks, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    sorted_ds = (
        ds.map_batches(key_batch, batch_format="pyarrow")
        .sort(["skey", "doc_id"])
        .materialize()
    )

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"first_skey": pa.array([], type=pa.int64()),
                 "first_id": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "first_skey": pa.array([batch["skey"][0].as_py()], type=pa.int64()),
                "first_id": pa.array([batch["doc_id"][0].as_py()], type=pa.int64()),
                "n": pa.array([len(batch)], type=pa.int64()),
            }
        )

    metas = sorted(
        sorted_ds.map_batches(
            block_meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: (r["first_skey"], r["first_id"]),
    )
    offsets: dict[tuple[int, int], int] = {}
    run = 0
    for m in metas:
        offsets[(m["first_skey"], m["first_id"])] = run
        run += m["n"]
    off_ref = _ray.put(offsets)

    def add_rank(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], type=pa.int64()),
                 "rank": pa.array([], type=pa.int64())}
            )
        off = _ray.get(off_ref)[
            (batch["skey"][0].as_py(), batch["doc_id"][0].as_py())
        ]
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "rank": pa.array(
                    np.arange(off + 1, off + n + 1, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    return sorted_ds.map_batches(add_rank, batch_format="pyarrow", batch_size=None)


def pack_sequences(
    ds: ray.data.Dataset, capacity: int = 1000, shard_size: int = 64
) -> ray.data.Dataset:
    """(shard, doc_id, seq_no, offset_chars) — greedy NEXT-FIT sequence
    packing: within each fixed doc_id shard (doc_id // shard_size),
    documents in doc_id order are appended to the current sequence while
    the running character total fits ``capacity``; a doc that does not
    fit starts the next sequence (seq_no increments; an oversize doc
    occupies a sequence alone — truncation is the tokenizer's concern,
    not the packer's). offset_chars is the doc's start position inside
    its sequence.

    Packing is SHARDED on purpose: global greedy packing is a sequential
    fold (each bin boundary depends on the entire prefix — it cannot be
    summarized per block the way a prefix SUM can), while per-shard
    packing is embarrassingly parallel, deterministic under
    repartitioning, and is what production pre-training pipelines
    actually do (pack within a stored shard, never across the corpus).
    One keyed groupby on the shard id; only (int, int) pairs shuffle.

    Oracle: recursive-CTE replay of the same fold per shard."""

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch["doc_id"].cast(pa.int64())
        return pa.Table.from_pydict(
            {
                "shard": pc.divide(ids, pa.scalar(shard_size, type=pa.int64())),
                "doc_id": ids,
                "n_chars": batch["n_chars"].cast(pa.int64()),
            }
        )

    OUT_SCHEMA = pa.schema(
        [
            ("shard", pa.int64()),
            ("doc_id", pa.int64()),
            ("seq_no", pa.int64()),
            ("offset_chars", pa.int64()),
        ]
    )

    def pack(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["doc_id"])
        out = []
        seq_no, fill = 0, 0
        for i, r in enumerate(rows):
            if i > 0 and fill + r["n_chars"] > capacity:
                seq_no += 1
                fill = 0
            out.append(
                {
                    "shard": r["shard"],
                    "doc_id": r["doc_id"],
                    "seq_no": seq_no,
                    "offset_chars": fill,
                }
            )
            fill += r["n_chars"]
        return pa.Table.from_pylist(out, schema=OUT_SCHEMA)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )


def _ranked_by_source(ds: ray.data.Dataset):
    """Distributed dense 0-based row_number within ``source`` ordered by
    (alpha_fp6, doc_id) — the shared core of quality_percentile and
    source_cap. Returns ``(sorted_ds, state_ref)`` where ``sorted_ds`` is
    the materialized globally-sorted projection (doc_id, source,
    alpha_fp6) and ``state_ref`` is a ``ray.put`` of
    ``(block_offsets, per_source_totals)`` keyed by each block's first
    row.

    Rank WITHOUT a per-source group materialization (a single web-scale
    source would exceed any worker): ONE global sort by (source,
    alpha_fp6, doc_id), then the char_budget_prefix block-offset
    machinery keyed by source — pass 1 reads one tiny (first-row key,
    per-source counts) row per block, the driver prefix-sums counts into
    per-(block, source) rank offsets (driver state O(#blocks + #sources)),
    pass 2 adds offset + within-block position. Rows never leave their
    block after the sort."""
    import ray as _ray

    q = quality_score(ds, passthrough=("source",))

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "alpha_fp6": batch["alpha_fp6"].cast(pa.int64()),
            }
        )

    sorted_ds = (
        q.map_batches(project, batch_format="pyarrow")
        .sort(["source", "alpha_fp6", "doc_id"])
        .materialize()
    )

    META_SCHEMA = pa.schema(
        [
            ("first_source", pa.string()),
            ("first_alpha", pa.int64()),
            ("first_doc", pa.int64()),
            ("source", pa.string()),
            ("count", pa.int64()),
        ]
    )

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pylist([], schema=META_SCHEMA)
        src = batch["source"].to_pylist()
        fs, fa, fd = src[0], batch["alpha_fp6"][0].as_py(), batch["doc_id"][0].as_py()
        rows = []
        # sources are contiguous inside a sorted block
        run_src, run_n = src[0], 0
        for s in src:
            if s != run_src:
                rows.append((run_src, run_n))
                run_src, run_n = s, 0
            run_n += 1
        rows.append((run_src, run_n))
        return pa.Table.from_pydict(
            {
                "first_source": pa.array([fs] * len(rows)),
                "first_alpha": pa.array([fa] * len(rows), type=pa.int64()),
                "first_doc": pa.array([fd] * len(rows), type=pa.int64()),
                "source": pa.array([r[0] for r in rows]),
                "count": pa.array([r[1] for r in rows], type=pa.int64()),
            },
            schema=META_SCHEMA,
        )

    metas = sorted(
        sorted_ds.map_batches(
            block_meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: (r["first_source"], r["first_alpha"], r["first_doc"]),
    )
    offsets: dict[tuple, dict[str, int]] = {}
    running: dict[str, int] = {}
    for m in metas:
        key = (m["first_source"], m["first_alpha"], m["first_doc"])
        offsets.setdefault(key, {}).setdefault(m["source"], running.get(m["source"], 0))
        running[m["source"]] = running.get(m["source"], 0) + m["count"]
    return sorted_ds, _ray.put((offsets, dict(running)))


def _block_ranks(batch: pa.Table, state) -> "tuple":
    """Per-row (0-based rank within source, source total) for one block of
    the _ranked_by_source sorted stream — numpy arrays, no copies of the
    batch."""
    import numpy as np

    offsets, totals = state
    src = batch["source"].to_pylist()
    key = (src[0], batch["alpha_fp6"][0].as_py(), batch["doc_id"][0].as_py())
    block_off = offsets[key]
    rank = np.empty(len(src), dtype=np.int64)
    n = np.empty(len(src), dtype=np.int64)
    pos_in_src = 0
    prev = src[0]
    for i, s in enumerate(src):
        if s != prev:
            pos_in_src = 0
            prev = s
        rank[i] = block_off.get(s, 0) + pos_in_src  # 0-based
        n[i] = totals[s]
        pos_in_src += 1
    return rank, n


def quality_percentile(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, source, alpha_fp6, pct_fp6) — each document's quality
    PERCENTILE within its source: pct = floor((rank-1) * 1e6 /
    (n_source-1) + 0.5) with rank = row_number ordered by (alpha_fp6,
    doc_id) inside the source (deterministic tie-break), 0 for a
    single-doc source. The source-balanced filtering primitive: "keep
    each source's top X%" compares pct_fp6 against one constant instead
    of per-source thresholds computed driver-side. Rank machinery:
    see _ranked_by_source."""
    import numpy as np

    import ray as _ray

    sorted_ds, state_ref = _ranked_by_source(ds)

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("alpha_fp6", pa.int64()),
            ("pct_fp6", pa.int64()),
        ]
    )

    def add_pct(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pylist([], schema=OUT_SCHEMA)
        rank, n = _block_ranks(batch, _ray.get(state_ref))
        pct = np.where(
            n > 1, np.floor(rank * 1e6 / np.maximum(n - 1, 1) + 0.5), 0
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "alpha_fp6": batch["alpha_fp6"].cast(pa.int64()),
                "pct_fp6": pa.array(pct),
            },
            schema=OUT_SCHEMA,
        )

    return sorted_ds.map_batches(add_pct, batch_format="pyarrow", batch_size=None)


def source_cap(ds: ray.data.Dataset, cap: int = 8) -> ray.data.Dataset:
    """(doc_id, source, alpha_fp6, top_rank) — each source's TOP ``cap``
    documents by quality (alpha ratio), top_rank = 1 for the best.
    The RefinedWeb-style per-domain cap: no single domain may contribute
    more than ``cap`` documents to the curated corpus, and the ones it
    does contribute are its best. Ordering is (alpha_fp6 DESC, doc_id
    DESC) — the exact reverse of the ascending (alpha_fp6, doc_id) rank,
    so top_rank = n_source - rank0 and the tie-break is deterministic.

    Same ONE-sort + block-offset rank machinery as quality_percentile
    (_ranked_by_source): no per-source group materialization, driver
    state O(#blocks + #sources), the cap filter is a vectorized in-block
    mask."""
    import numpy as np

    import ray as _ray

    sorted_ds, state_ref = _ranked_by_source(ds)

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("alpha_fp6", pa.int64()),
            ("top_rank", pa.int64()),
        ]
    )

    def keep_top(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pylist([], schema=OUT_SCHEMA)
        rank, n = _block_ranks(batch, _ray.get(state_ref))
        top_rank = n - rank  # 1-based from the best (sort was ascending)
        mask = top_rank <= cap
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "alpha_fp6": batch["alpha_fp6"].cast(pa.int64()),
                "top_rank": pa.array(top_rank),
            },
            schema=OUT_SCHEMA,
        ).filter(pa.array(mask))

    return sorted_ds.map_batches(keep_top, batch_format="pyarrow", batch_size=None)


def rare_bigram_rate(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bigrams, n_rare, rare_fp6) — corpus-rarity novelty
    signal: the fraction of a document's word-bigram occurrences whose
    bigram appears EXACTLY ONCE in the whole corpus. The exact-integer
    stand-in for the CCNet/KenLM perplexity gate (Wenzek et al. 2020):
    documents dominated by corpus-unique n-grams are the high-perplexity
    outliers a curation pipeline routes to review, and unlike a log-prob
    LM score the rate is pure integer arithmetic, so it replays
    bit-for-bit in SQL.

    Scale shape: docs explode to (bh, doc_id, c) rows — the shared 60-bit
    md5 bigram hash with in-doc multiplicity pre-combined (one md5 per
    DISTINCT bigram per doc; the text never rides the shuffle). ONE keyed
    groupby on bh emits a (doc_id, 1) rare mark per global-singleton
    bigram (sum(c) == 1 implies one occurrence in one doc); the marks ride
    a tagged union with the per-doc bigram totals into a second int-only
    doc_id groupby — no join operator, two keyed shuffles total, driver
    holds nothing. The oracle hashes with the SAME 60-bit expression, so
    equality is by construction, collisions included."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from .dedup import shingle_base_hash

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        out_c: list[int] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = ascii_tokens(t)
            cnt = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            for bg, c in cnt.items():
                out_h.append(shingle_base_hash(bg))
                out_d.append(d)
                out_c.append(c)
        return pa.Table.from_pydict(
            {
                "bh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "c": pa.array(out_c, type=pa.int64()),
            }
        )

    MERGE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("n_rare", pa.int64())]
    )

    def totals(batch: pa.Table) -> pa.Table:
        ids, nbg = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ids.append(d)
            nbg.append(max(len(ascii_tokens(t)) - 1, 0))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bigrams": pa.array(nbg, type=pa.int64()),
                "n_rare": pa.array([0] * len(ids), type=pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    def singleton_marks(group: pa.Table) -> pa.Table:
        import numpy as np

        c = group["c"].to_numpy(zero_copy_only=False)
        if c.sum() != 1:
            return pa.Table.from_pylist([], schema=MERGE_SCHEMA)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [group["doc_id"][int(np.argmax(c))].as_py()], type=pa.int64()
                ),
                "n_bigrams": pa.array([0], type=pa.int64()),
                "n_rare": pa.array([1], type=pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    marks = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bh")
        .map_groups(singleton_marks, batch_format="pyarrow")
    )
    merged = (
        ds.map_batches(totals, batch_format="pyarrow")
        .union(marks)
        .groupby("doc_id")
        .aggregate(Sum("n_bigrams"), Sum("n_rare"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        nbg = batch["sum(n_bigrams)"].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = batch["sum(n_rare)"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.zeros(len(nbg), dtype=np.int64)
        nz = nbg > 0
        rate[nz] = np.floor(
            nr[nz].astype(np.float64) * 1e6 / nbg[nz] + 0.5
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bigrams": pa.array(nbg),
                "n_rare": pa.array(nr),
                "rare_fp6": pa.array(rate),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def source_quality_report(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_docs, sum_chars, sum_alpha_fp6, min_alpha_fp6,
    max_alpha_fp6) — the per-source corpus health rollup a curation team
    reads before weighting sources. Exact integer sums (consumers derive
    means as sum/n at display time — no float drift in the contract).

    Pre-aggregation pattern: each batch collapses to AT MOST ONE ROW PER
    SOURCE inside map_batches (Arrow-native pa.TableGroupBy, the
    props_key_stats pattern — no pandas round trip in the hot path)
    BEFORE the keyed shuffle, so the all-to-all moves O(#sources x
    #blocks) rows regardless of corpus size — the combiner discipline
    every aggregation in this repo follows, here over the quality_score
    operator's own output."""
    from ray.data.aggregate import Count, Max, Min, Sum

    q = quality_score(ds, passthrough=("source",))

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select(["source", "n_chars_t", "alpha_fp6"]), "source"
        ).aggregate(
            [
                # count a NEVER-NULL value column, not the key: counting
                # 'source' reports 0 docs for a null-source group while
                # its sums stay non-zero (SQL COUNT(*) semantics differ)
                ("n_chars_t", "count"),
                ("n_chars_t", "sum"),
                ("alpha_fp6", "sum"),
                ("alpha_fp6", "min"),
                ("alpha_fp6", "max"),
            ]
        )
        return pa.Table.from_pydict(
            {
                "source": g["source"],
                "n_docs": g["n_chars_t_count"].cast(pa.int64()),
                "sum_chars": g["n_chars_t_sum"].cast(pa.int64()),
                "sum_alpha_fp6": g["alpha_fp6_sum"].cast(pa.int64()),
                "min_alpha_fp6": g["alpha_fp6_min"].cast(pa.int64()),
                "max_alpha_fp6": g["alpha_fp6_max"].cast(pa.int64()),
            }
        )

    agg = (
        q.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs"),
            Sum("sum_chars"),
            Sum("sum_alpha_fp6"),
            Min("min_alpha_fp6"),
            Max("max_alpha_fp6"),
        )
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_docs": batch["sum(n_docs)"].cast(pa.int64()),
                "sum_chars": batch["sum(sum_chars)"].cast(pa.int64()),
                "sum_alpha_fp6": batch["sum(sum_alpha_fp6)"].cast(pa.int64()),
                "min_alpha_fp6": batch["min(min_alpha_fp6)"].cast(pa.int64()),
                "max_alpha_fp6": batch["max(max_alpha_fp6)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 3,
    min_df: int = 2,
    vocab_max: int = 65536,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, term, tf, score_fp6, rnk) — each document's ``k`` most
    DISTINCTIVE terms by classic tf-idf: score = tf * floor(1e6 *
    ln(N/df) + 0.5) over lowercase alphabetic word tokens, ranked by
    (score DESC, term ASC). The keyword-extraction / topic-signal
    primitive of a text-curation pipeline.

    Exact-integer contract: tf and df are exact counts; N/df is one IEEE
    double division of two exact integers and ln() is the platform libm
    in BOTH engines (Python math.log and DuckDB ln — verified bit-equal),
    so score_fp6 is the same int64 on both sides.

    Scale shape: two passes. Pass A builds the document-frequency table
    with an IN-BATCH combiner (each block emits one (term, n_docs) row
    per distinct term) -> one keyed groupby(term) -> min_df prune +
    (df DESC, term ASC) truncation to ``vocab_max`` — the standard
    bounded-vocabulary cap that makes the broadcast O(V), not O(corpus).
    The idf table is computed driver-side over the <=V vocab rows and
    ray.put ONCE. Pass B is purely per-document: tf + lookup + top-k
    inside map_batches — no shuffle touches the text."""
    import math
    import re
    from collections import Counter

    import ray as _ray

    word_re = re.compile(r"[A-Za-z]+")

    if n_docs is None:
        n_docs = ds.count()  # metadata-only on a bare parquet read

    def df_partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for t in batch["text"].to_pylist():
            df.update({w.lower() for w in word_re.findall(t)})
        terms = sorted(df)
        return pa.Table.from_pydict(
            {
                "term": pa.array(terms, type=pa.string()),
                "nd": pa.array([df[t] for t in terms], type=pa.int64()),
            }
        )

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("nd")
    )
    vocab_rows = (
        df_ds.map_batches(
            lambda b: b.rename_columns(["term", "df"]),
            batch_format="pyarrow",
        )
        .filter(expr=f"df >= {int(min_df)}")
        .sort(["df", "term"], descending=[True, False])
        .limit(vocab_max)
        .take_all()
    )
    idf = {
        r["term"]: math.floor(math.log(n_docs / r["df"]) * 1e6 + 0.5)
        for r in vocab_rows
    }
    idf_ref = _ray.put(idf)

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
            ("score_fp6", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def score_batch(batch: pa.Table) -> pa.Table:
        idf = _ray.get(idf_ref)
        out = {c: [] for c in ("doc_id", "term", "tf", "score_fp6", "rnk")}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            tf = Counter(w.lower() for w in word_re.findall(text))
            scored = [
                (t, n, n * idf[t]) for t, n in tf.items() if t in idf
            ]
            scored.sort(key=lambda r: (-r[2], r[0]))
            for rnk, (t, n, s) in enumerate(scored[:k], 1):
                out["doc_id"].append(doc_id)
                out["term"].append(t)
                out["tf"].append(n)
                out["score_fp6"].append(s)
                out["rnk"].append(rnk)
        return pa.Table.from_pydict(
            {c: pa.array(out[c], type=OUT_SCHEMA.field(c).type) for c in out},
            schema=OUT_SCHEMA,
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset, chunk_tokens: int = 64, stride: int = 48
) -> ray.data.Dataset:
    """(doc_id, chunk_id, start_tok, n_tok, chunk_text) — fixed-size
    sliding-window chunking: windows of ``chunk_tokens`` whitespace
    tokens starting every ``stride`` tokens (overlap = chunk_tokens -
    stride), the context-window preparation step before tokenize/pack.
    Deterministic stop rule: emit start=0, then further starts only
    while the PREVIOUS window did not already reach the end
    (start - stride + chunk_tokens < n) — so the tail partial window is
    kept but no window fully contained in its predecessor is emitted.
    Empty docs emit no chunks. Purely per-document 1->N fan-out inside
    map_batches: no shuffle, text rides once, output blocks are
    re-chunked by Ray's streaming executor."""

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("start_tok", pa.int64()),
            ("n_tok", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )

    def explode(batch: pa.Table) -> pa.Table:
        out = {c: [] for c in ("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text")}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(text)
            n = len(toks)
            if n == 0:
                continue
            for cid, start in enumerate(range(0, n, stride)):
                if start > 0 and start - stride + chunk_tokens >= n:
                    break
                win = toks[start : start + chunk_tokens]
                out["doc_id"].append(doc_id)
                out["chunk_id"].append(cid)
                out["start_tok"].append(start)
                out["n_tok"].append(len(win))
                out["chunk_text"].append(" ".join(win))
        return pa.Table.from_pydict(
            {c: pa.array(out[c], type=OUT_SCHEMA.field(c).type) for c in out},
            schema=OUT_SCHEMA,
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def tokenize_ids(ds: ray.data.Dataset, vocab_size: int = 16) -> ray.data.Dataset:
    """(doc_id, pos, tid) — the tokenizer stage of a training pipeline:
    every token occurrence mapped to its vocabulary id, exploded to one
    row per position (the columnar token-id stream that feeds packing).
    Vocabulary = the corpus top-``vocab_size`` tokens by (count DESC,
    token ASC), ids 1..V in rank order; everything else is UNK = 0.

    Scale shape: the vocab comes from the token_freq pass (per-block
    Counter partials, one tiny keyed groupby, only the top-V rows reach
    the driver — bounded state by construction) and is broadcast once via
    ray.put; encoding is embarrassingly parallel per doc. The id stream
    is (int, int, int) rows — the text column never leaves the encode
    stage."""
    vocab_rows = sorted(
        token_freq(ds, k=vocab_size).take_all(),
        key=lambda r: (-r["n"], r["token"]),
    )
    vocab = {r["token"]: i + 1 for i, r in enumerate(vocab_rows)}
    vocab_ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        out_d, out_p, out_t = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for pos, tok in enumerate(ascii_tokens(text)):
                out_d.append(doc_id)
                out_p.append(pos)
                out_t.append(v.get(tok, 0))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "pos": pa.array(out_p, type=pa.int64()),
                "tid": pa.array(out_t, type=pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def pack_token_blocks(
    ds: ray.data.Dataset,
    seq_len: int = 64,
    vocab_size: int = 16,
    drop_remainder: bool = True,
) -> ray.data.Dataset:
    """(example_id, pos, tid, doc_id) — GPT-style concat-and-chunk token
    packing, the step between the tokenizer and the training loader:
    every document's token-id stream is concatenated in doc_id order and
    the global stream is split into fixed-length examples of ``seq_len``
    tokens, crossing document boundaries (doc_id is kept per token so the
    loader can build cross-doc attention masks). Complements
    pack_sequences, which next-fits WHOLE documents into capacity-bounded
    sequences; this operator chunks the flat token stream.
    ``drop_remainder=True`` (the training convention) drops the final
    partial example.

    Scale shape — the token stream itself NEVER shuffles: the vocabulary
    is the bounded token_freq top-V broadcast once; the global offsets
    come from the same one-sort + block-offset prefix-sum machinery as
    char_budget_prefix (pass 1 reads one (first_doc_id, n_tokens) pair
    per block, the driver folds O(#blocks) ints, pass 2 re-tokenizes and
    emits each doc's tokens at offset + within-block cumsum). At 100 TB
    the doc_id sort is the storage order and the only moving data is the
    (int, int, int, int) output rows.

    Oracle: the tokenize_ids replay + ROW_NUMBER() OVER (ORDER BY
    doc_id, pos) global position, example_id = gpos // L, pos = gpos % L.
    """
    import ray as _ray

    vocab_rows = sorted(
        token_freq(ds, k=vocab_size).take_all(),
        key=lambda r: (-r["n"], r["token"]),
    )
    vocab = {r["token"]: i + 1 for i, r in enumerate(vocab_rows)}
    vocab_ref = _ray.put(vocab)

    sorted_ds = ds.sort("doc_id").materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"first_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64())}
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = sum(len(ascii_tokens(t)) for t in batch["text"].to_pylist())
        return pa.Table.from_pydict(
            {
                "first_id": pa.array([int(ids.min())], type=pa.int64()),
                "n_tok": pa.array([int(n)], type=pa.int64()),
            }
        )

    metas = sorted(
        sorted_ds.map_batches(
            block_meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: r["first_id"],
    )
    offsets: dict[int, int] = {}
    run = 0
    for m in metas:
        offsets[m["first_id"]] = run
        run += m["n_tok"]
    keep_limit = run - (run % seq_len) if drop_remainder else run
    off_ref = _ray.put(offsets)

    OUT_SCHEMA = pa.schema(
        [
            ("example_id", pa.int64()),
            ("pos", pa.int64()),
            ("tid", pa.int64()),
            ("doc_id", pa.int64()),
        ]
    )

    def encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {f.name: pa.array([], type=f.type) for f in OUT_SCHEMA},
                schema=OUT_SCHEMA,
            )
        v = _ray.get(vocab_ref)
        off = _ray.get(off_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        start = off[int(ids.min())]
        out_g, out_t, out_d = [], [], []
        for doc_id, text in zip(
            ids.tolist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(text)
            for tok in toks:
                out_g.append(start)
                out_t.append(v.get(tok, 0))
                out_d.append(doc_id)
                start += 1
        g = np.asarray(out_g, dtype=np.int64)
        keep = g < keep_limit
        return pa.Table.from_pydict(
            {
                "example_id": pa.array(g[keep] // seq_len, type=pa.int64()),
                "pos": pa.array(g[keep] % seq_len, type=pa.int64()),
                "tid": pa.array(
                    np.asarray(out_t, dtype=np.int64)[keep], type=pa.int64()
                ),
                "doc_id": pa.array(
                    np.asarray(out_d, dtype=np.int64)[keep], type=pa.int64()
                ),
            },
            schema=OUT_SCHEMA,
        )

    return sorted_ds.map_batches(
        encode, batch_format="pyarrow", batch_size=None
    )


def sqrt_apportion(counts: dict[str, int], total: int) -> dict[str, int]:
    """Pure-integer largest-remainder apportionment of ``total`` over
    sqrt-tempered weights s_k = floor(sqrt(counts[k]) * 1e6): base share
    (total * s_k) // S, leftover +1 to the largest (total * s_k) mod S
    (ties to key ASC). Order-independent and bit-replayable in SQL —
    sqrt is one correctly-rounded IEEE op, everything after is int64."""
    keys = sorted(counts)
    s = {k: int(np.floor(np.sqrt(np.float64(counts[k])) * 1e6)) for k in keys}
    big = sum(s.values())
    base = {k: (total * s[k]) // big for k in keys}
    rem = {k: (total * s[k]) % big for k in keys}
    leftover = total - sum(base.values())
    for k in sorted(keys, key=lambda x: (-rem[x], x))[:leftover]:
        base[k] += 1
    return base


def mixture_sample(
    ds: ray.data.Dataset, total: int = 100, salt: str = "mix"
) -> ray.data.Dataset:
    """(source, doc_id, rk) — temperature-mixed corpus sampling (the
    multilingual-pretraining mixing rule, Conneau & Lample 2019 with
    tau = 0.5): each source's quota is proportional to sqrt(its doc
    count), so small sources are up-weighted relative to their raw share;
    within a source the quota picks the same deterministic md5-priority
    order as stratified_sample.

    Integer apportionment contract (replayable, order-independent):
    s_i = floor(sqrt(c_i) * 1e6) as int64, base_i = (total * s_i) // S
    with S = sum s_i, and the leftover total - sum(base_i) goes +1 each
    to the sources with the largest (total * s_i) mod S, ties to source
    ASC — the largest-remainder method in pure integers (sqrt is one
    correctly-rounded IEEE op, identical in numpy and DuckDB).

    Scale shape: pass 1 is a per-source COUNT (tiny keyed groupby, one
    row per source reaches the driver); quotas are O(#sources) driver
    math broadcast once; pass 2 reuses the stratified per-block top-k
    prune, so the shuffle moves O(max_quota x sources x blocks) id rows,
    never documents."""
    counts = {
        r["source"]: r["count()"]
        for b in ds.groupby("source").aggregate(Count()).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    quota = sqrt_apportion(counts, total)
    max_q = max(quota.values()) if quota else 0
    quota_ref = ray.put(quota)

    def prune(batch: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        by_src: dict[str, list[tuple[str, int]]] = {}
        for src, doc_id in zip(
            batch["source"].to_pylist(), batch["doc_id"].to_pylist()
        ):
            if q.get(src, 0) > 0:
                by_src.setdefault(src, []).append(
                    (_md5(f"{salt}:{doc_id}"), doc_id)
                )
        srcs_o, prios, ids = [], [], []
        for src, rows in by_src.items():
            for prio, doc_id in sorted(rows)[: q[src]]:
                srcs_o.append(src)
                prios.append(prio)
                ids.append(doc_id)
        return pa.Table.from_pydict(
            {
                "source": pa.array(srcs_o, type=pa.string()),
                "prio": pa.array(prios, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        src = group["source"][0].as_py()
        rows = sorted(
            zip(group["prio"].to_pylist(), group["doc_id"].to_pylist())
        )[: q.get(src, 0)]
        return pa.Table.from_pydict(
            {
                "source": pa.array([src] * len(rows), type=pa.string()),
                "doc_id": pa.array([d for _, d in rows], type=pa.int64()),
                "rk": pa.array(range(1, len(rows) + 1), type=pa.int64()),
            }
        )

    _ = max_q  # documented bound for the shuffle width
    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(pick, batch_format="pyarrow")
    )


def quality_histogram(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, bin, n_docs) — distribution of the alpha quality score per
    source in 0.1-wide bins (bin = alpha_fp6 // 100000): the
    threshold-picking diagnostic a curation run reads before setting the
    quality gate. Per-block (source, bin) combining collapses each block
    to <= sources x 11 rows before ONE tiny keyed groupby."""
    from collections import Counter

    scored = quality_score(ds, passthrough=("source",))

    def combine(batch: pa.Table) -> pa.Table:
        cnt: Counter[tuple[str, int]] = Counter(
            zip(
                batch["source"].to_pylist(),
                (a // 100000 for a in batch["alpha_fp6"].to_pylist()),
            )
        )
        return pa.Table.from_pydict(
            {
                "source": pa.array([s for s, _ in cnt], type=pa.string()),
                "bin": pa.array([b for _, b in cnt], type=pa.int64()),
                "n": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    agg = (
        scored.map_batches(combine, batch_format="pyarrow")
        .groupby(["source", "bin"])
        .aggregate(Sum("n"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "source": batch["source"],
                "bin": batch["bin"].cast(pa.int64()),
                "n_docs": batch["sum(n)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


_HTML_RES: list | None = None


def strip_html_text(text: str) -> str:
    """The main-content extraction contract (HTML boilerplate strip):
    drop <script>/<style> blocks, turn block-closing tags into line
    breaks, strip remaining tags, unescape the six common entities
    (&amp; LAST, single pass — '&amp;lt;' becomes '&lt;' and stops),
    collapse ASCII whitespace per line, drop empty lines. Every step is
    an RE2-safe regex or literal replace, so the DuckDB oracle replays
    the chain expression-for-expression."""
    global _HTML_RES
    import re

    if _HTML_RES is None:
        _HTML_RES = [
            re.compile(r"(?is)<script[^>]*>.*?</script>"),
            re.compile(r"(?is)<style[^>]*>.*?</style>"),
            re.compile(r"(?i)<(br|/p|/div|/li|/tr|/h[1-6])[^>]*>"),
            re.compile(r"<[^>]*>"),
            re.compile(r"[ \t\r\v\f]+"),
        ]
    t = _HTML_RES[0].sub(" ", text)
    t = _HTML_RES[1].sub(" ", t)
    t = _HTML_RES[2].sub("\n", t)
    t = _HTML_RES[3].sub(" ", t)
    for a, b in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = t.replace(a, b)
    # strip ASCII space only — the DuckDB oracle's trim() and the sibling
    # extract_main_content visible() both trim ' ' alone; bare .strip()
    # would also eat U+00A0 etc. and diverge from the oracle.
    lines = [_HTML_RES[4].sub(" ", x).strip(" \t") for x in t.split("\n")]
    return "\n".join(line for line in lines if line)


def strip_html(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, clean_text, n_chars_clean) — HTML boilerplate strip over
    the text column (identity on already-plain text): the first stage of
    a web main-content extraction pipeline. Pure per-doc map — compiled
    regexes cached per worker, no shuffle."""

    def clean(batch: pa.Table) -> pa.Table:
        texts = [strip_html_text(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "clean_text": pa.array(texts, type=pa.string()),
                "n_chars_clean": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    ds: ray.data.Dataset,
    min_words: int = 50,
    max_words: int = 100_000,
) -> ray.data.Dataset:
    """(doc_id, n_words, r_words, r_mean, r_symbol, r_bullet, r_ellipsis,
    r_alpha, r_stop, passes) — the full Gopher rule-set quality filter
    (Rae et al. 2021, Table A1), each rule an exact INTEGER comparison so
    the whole filter replays bit-for-bit in SQL (no float ratios):

      r_words:    min_words <= n <= max_words
      r_mean:     3n <= sum(len(word)) <= 10n  (mean word length in [3,10])
      r_symbol:   10*(#'#' chars + #'...' runs) <= n  (symbol/word <= 0.1)
      r_bullet:   10*(lines starting with -/*) <= 9*n_lines  (<= 0.9)
      r_ellipsis: 10*(lines ending with ...) <= 3*n_lines    (<= 0.3)
      r_alpha:    5*(words containing a letter) >= 4n        (>= 0.8)
      r_stop:     >= 2 occurrences of the 8 Gopher stopwords

    Empty docs fail r_words and r_mean. Pure per-row map over compiled
    regexes — no shuffle; complements quality_score (ratio FEATURES) by
    emitting the decision bits a curation gate consumes directly."""
    import re

    alpha_word_re = re.compile(f"[{ALPHA_CLASS}]")
    bullet_re = re.compile(r"^ *[-*]")
    ellipsis_end_re = re.compile(r"\.\.\. *$")
    stop_set = frozenset(GOPHER_STOPWORDS)

    def batch_fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            k: []
            for k in (
                "n_words", "r_words", "r_mean", "r_symbol", "r_bullet",
                "r_ellipsis", "r_alpha", "r_stop", "passes",
            )
        }
        for t in batch["text"].to_pylist():
            toks = ascii_tokens(t)
            n = len(toks)
            sum_len = sum(len(w) for w in toks)
            lines = t.split("\n")
            n_lines = len(lines)
            n_bullet = sum(1 for ln in lines if bullet_re.match(ln))
            n_ell = sum(1 for ln in lines if ellipsis_end_re.search(ln))
            n_sym = t.count("#") + t.count("...")
            n_alpha_w = sum(1 for w in toks if alpha_word_re.search(w))
            n_stop = sum(1 for w in toks if w in stop_set)
            r = {
                "r_words": int(min_words <= n <= max_words),
                "r_mean": int(n > 0 and 3 * n <= sum_len <= 10 * n),
                "r_symbol": int(10 * n_sym <= n),
                "r_bullet": int(10 * n_bullet <= 9 * n_lines),
                "r_ellipsis": int(10 * n_ell <= 3 * n_lines),
                "r_alpha": int(5 * n_alpha_w >= 4 * n),
                "r_stop": int(n_stop >= 2),
            }
            cols["n_words"].append(n)
            for k, v in r.items():
                cols[k].append(v)
            cols["passes"].append(int(all(r.values())))
        out = {"doc_id": batch["doc_id"]}
        out.update({k: pa.array(v, type=pa.int64()) for k, v in cols.items()})
        return pa.Table.from_pydict(out)

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def char_entropy(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars_t, n_distinct, ent_fp9) — character-level Shannon
    entropy in nats, the compression-ratio-style quality signal (gibberish
    and keyboard-mash score low-entropy-per-distinct-char; natural prose
    clusters tightly): H = sum_c (k_c/n) * ln(n/k_c).

    Exact-integer replay contract (the tfidf/dsir libm-ln discipline):
    per distinct char, term = k_c * floor(ln(n/k_c) * 1e9) — n/k_c is the
    same IEEE double division of two ints on both engines, ln is platform
    libm (proven bit-equal vs DuckDB), and the final ent_fp9 = S // n is
    integer floor division, so the whole statistic hashes green. Pure
    per-row map (collections.Counter is C-speed), no shuffle."""
    import math
    from collections import Counter

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_chars: list[int] = []
        n_dist: list[int] = []
        ents: list[int] = []
        for t in batch["text"].to_pylist():
            n = len(t)
            if n == 0:
                n_chars.append(0)
                n_dist.append(0)
                ents.append(0)
                continue
            counts = Counter(t)
            S = sum(
                k * math.floor(math.log(n / k) * 1e9)
                for k in counts.values()
            )
            n_chars.append(n)
            n_dist.append(len(counts))
            ents.append(S // n)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_chars_t": pa.array(n_chars, type=pa.int64()),
                "n_distinct": pa.array(n_dist, type=pa.int64()),
                "ent_fp9": pa.array(ents, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


_MAIN_RES = None


def extract_main_content_text(text: str, min_chars: int = 25):
    """The DOM-heuristic main-content classifier (jusText/Readability
    link-density family) as an exact RE2-safe regex chain the DuckDB
    oracle replays expression-for-expression:

      1. drop <script>/<style> blocks;
      2. split into blocks at block-closing tags (br,/p,/div,/li,/tr,/h*);
      3. per block, visible text = strip tags -> collapse ASCII
         whitespace runs to one space -> trim; anchor text = the same
         reduction of every non-greedy <a ...>...</a> inner span;
      4. a block is MAIN CONTENT iff len(visible) >= min_chars and
         2 * anchor_chars <= len(visible)   (link density <= 0.5).

    Returns (n_blocks, n_kept, main_text): n_blocks counts non-empty
    visible blocks, main_text joins kept blocks with newline. No entity
    unescaping here — compose with strip_html for that."""
    global _MAIN_RES
    import re

    if _MAIN_RES is None:
        _MAIN_RES = [
            re.compile(r"(?is)<script[^>]*>.*?</script>"),
            re.compile(r"(?is)<style[^>]*>.*?</style>"),
            re.compile(r"(?i)<(?:br|/p|/div|/li|/tr|/h[1-6])[^>]*>"),
            re.compile(r"(?is)<a[^>]*>(.*?)</a>"),
            re.compile(r"<[^>]*>"),
            re.compile(r"[ \t\n\r\v\f]+"),
        ]
    scrub, style, block_split, a_re, tag_re, ws_re = _MAIN_RES

    def visible(s: str) -> str:
        return ws_re.sub(" ", tag_re.sub(" ", s)).strip(" ")

    t = style.sub(" ", scrub.sub(" ", text))
    n_blocks = 0
    kept: list[str] = []
    for b in block_split.split(t):
        v = visible(b)
        if not v:
            continue
        n_blocks += 1
        a_chars = sum(len(visible(inner)) for inner in a_re.findall(b))
        if len(v) >= min_chars and 2 * a_chars <= len(v):
            kept.append(v)
    return n_blocks, len(kept), "\n".join(kept)


def extract_main_content(
    ds: ray.data.Dataset, min_chars: int = 25
) -> ray.data.Dataset:
    """(doc_id, n_blocks, n_kept, main_text) — link-density main-content
    extraction over the text column: the DOM-heuristics stage of the web
    extraction pipeline (nav bars, footers and link farms are blocks that
    are short or mostly anchor text; article prose is long and link-poor).
    Pure per-doc map, compiled patterns cached per worker, no shuffle."""

    def run(batch: pa.Table) -> pa.Table:
        nb: list[int] = []
        nk: list[int] = []
        mt: list[str] = []
        for t in batch["text"].to_pylist():
            b, k, m = extract_main_content_text(t, min_chars)
            nb.append(b)
            nk.append(k)
            mt.append(m)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_blocks": pa.array(nb, type=pa.int64()),
                "n_kept": pa.array(nk, type=pa.int64()),
                "main_text": pa.array(mt, type=pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def typo_token_pairs(
    ds: ray.data.Dataset, vocab_k: int = 2000
) -> ray.data.Dataset:
    """(token_a, token_b, n_a, n_b) — vocabulary token pairs at edit
    distance EXACTLY 1 (one substitution, insertion or deletion), found
    WITHOUT an all-pairs pass: the SymSpell deletion-neighborhood trick
    (Garbe 2012). Two tokens are within edit distance 1 iff they share
    a member of {token} ∪ {single-deletion variants}, so each vocab
    token emits ≤ len+1 variant rows, ONE variant-keyed groupby
    collects candidates, and an in-bucket exact distance-1 check kills
    the ≤2-distance false positives the neighborhood admits. The
    typo/near-miss normalization primitive (query-log cleanup, OCR
    confusion pairs) — at a 10^8-type vocabulary the candidate volume
    is O(vocab · len), never O(vocab²).

    Vocab = top-``vocab_k`` whitespace tokens by (n desc, token) — the
    [[token_freq]] pass reused verbatim, so the oracle's LIMIT picks
    the identical set. A pair sharing several variants (always, via
    each side's own deletion) dedups in ONE pair-keyed groupby.

    Oracle: self-join of the same top-k vocab ON levenshtein() = 1."""
    from ray.data.aggregate import Max

    vocab = token_freq(ds, k=vocab_k)

    def variants(batch: pa.Table) -> pa.Table:
        out_v, out_t, out_n = [], [], []
        for t, n in zip(
            batch["token"].to_pylist(), batch["n"].to_pylist()
        ):
            out_v.append(t)
            out_t.append(t)
            out_n.append(n)
            for i in range(len(t)):
                out_v.append(t[:i] + t[i + 1 :])
                out_t.append(t)
                out_n.append(n)
        return pa.Table.from_pydict(
            {
                "variant": pa.array(out_v, type=pa.string()),
                "token": pa.array(out_t, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    def _dist1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if la == lb:
            return sum(1 for x, y in zip(a, b) if x != y) == 1
        if abs(la - lb) != 1:
            return False
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # a is shorter: b deletes to a iff they align around one gap
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    PAIR = pa.schema(
        [
            ("token_a", pa.string()),
            ("token_b", pa.string()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
        ]
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        toks = group["token"].to_pylist()
        ns = group["n"].to_pylist()
        seen: dict[str, int] = {}
        for t, n in zip(toks, ns):
            seen[t] = n
        items = sorted(seen.items())
        rows = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, b = items[i][0], items[j][0]
                if _dist1(a, b):
                    rows.append(
                        {
                            "token_a": a,
                            "token_b": b,
                            "n_a": items[i][1],
                            "n_b": items[j][1],
                        }
                    )
        return pa.Table.from_pylist(rows, schema=PAIR)

    pairs = (
        vocab.map_batches(variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["token_a", "token_b"])
        .aggregate(Max("n_a", alias_name="n_a"), Max("n_b", alias_name="n_b"))
    )

    def cast_cols(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "token_a": batch["token_a"],
                "token_b": batch["token_b"],
                "n_a": batch["n_a"].cast(pa.int64()),
                "n_b": batch["n_b"].cast(pa.int64()),
            }
        )

    return pairs.map_batches(cast_cols, batch_format="pyarrow")


def pmi_collocations(
    ds: ray.data.Dataset,
    k: int = 50,
    vocab_size: int = 4096,
    min_count: int = 5,
) -> ray.data.Dataset:
    """(tok_a, tok_b, n_ab, pmi_fp9) — the corpus's top-k collocations by
    pointwise mutual information over adjacent-token bigrams (Church &
    Hanks 1990): PMI = ln(n_ab*N / (n_a*n_b)) with N = total bigram
    occurrences, n_a/n_b = the bigram table's left/right marginals.
    Restricted to bigrams whose both tokens are in the top-``vocab_size``
    vocabulary (the standard boundedness trick — marginals and the pair
    table stay O(V)/O(V^2)); pairs below ``min_count`` are noise and
    dropped AFTER marginals are taken.

    Scale shape: per-batch bigram Counter partials -> ONE keyed (a, b)
    groupby; marginals are two tiny groupbys over the bounded pair table,
    broadcast O(V); scoring is per-row. Exactness: products n_ab*N and
    n_a*n_b fold as Python ints and round to double ONCE (float(int) ==
    DuckDB's CAST(HUGEINT AS DOUBLE)), then the shared libm-ln + 1e9
    fixed-point floor — hash-green."""
    import math
    from collections import Counter

    import ray as _ray
    from ray.data.aggregate import Sum

    vocab_rows = token_freq(ds, k=vocab_size).take_all()
    vocab = frozenset(r["token"] for r in vocab_rows)
    vocab_ref = _ray.put(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            toks = ascii_tokens(t)
            for a, b in zip(toks, toks[1:]):
                if a in v and b in v:
                    c[(a, b)] += 1
        return pa.Table.from_pydict(
            {
                "a": pa.array([p[0] for p in c], type=pa.string()),
                "b": pa.array([p[1] for p in c], type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    bc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n"))
        .materialize()
    )

    # Bounded marginals (<= V rows each) broadcast once; N is their sum.
    left = {
        r["a"]: r["sum(sum(n))"]
        for r in bc.groupby("a").aggregate(Sum("sum(n)")).take_all()
    }
    right = {
        r["b"]: r["sum(sum(n))"]
        for r in bc.groupby("b").aggregate(Sum("sum(n)")).take_all()
    }
    total = sum(left.values())
    mref = _ray.put((left, right, total))

    def score(batch: pa.Table) -> pa.Table:
        la, rb, N = _ray.get(mref)
        outs = {"tok_a": [], "tok_b": [], "n_ab": [], "pmi_fp9": []}
        for a, b, n_ab in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["sum(n)"].to_pylist(),
        ):
            if n_ab < min_count:
                continue
            # Python-int products, ONE rounding to double each side
            ratio = float(n_ab * N) / float(la[a] * rb[b])
            outs["tok_a"].append(a)
            outs["tok_b"].append(b)
            outs["n_ab"].append(n_ab)
            outs["pmi_fp9"].append(math.floor(math.log(ratio) * 1e9))
        return pa.Table.from_pydict(
            {
                "tok_a": pa.array(outs["tok_a"], type=pa.string()),
                "tok_b": pa.array(outs["tok_b"], type=pa.string()),
                "n_ab": pa.array(outs["n_ab"], type=pa.int64()),
                "pmi_fp9": pa.array(outs["pmi_fp9"], type=pa.int64()),
            }
        )

    return (
        bc.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_fp9", "tok_a", "tok_b"], descending=[True, False, False])
        .limit(k)
    )


def weighted_sample(
    ds: ray.data.Dataset,
    k: int = 100,
    weight_col: str = "n_chars",
    salt: str = "wrs",
) -> ray.data.Dataset:
    """(doc_id, key_fp9, rk) — deterministic weighted sampling WITHOUT
    replacement, probability proportional to ``weight_col`` (Efraimidis &
    Spirakis 2006, exponential-key form): every row gets the key
    e = -ln(u)/w with u a content-derived md5 uniform, and the k
    SMALLEST keys are the sample — the token-budget-proportional corpus
    subsample (long docs proportionally more likely), reproducible
    across runs/partitionings because u is a hash, not an RNG.

    Exactness: u = (h60+1)/2^60 — a 60-bit md5 integer scaled by an
    exact power of two, so both engines round the SAME double; libm ln
    and the left-to-right -ln(u)/w*1e9 expression are bit-equal, and
    floor(...) makes the comparison key an exact int (ties by doc_id).
    Zero-weight rows are excluded (no division). Scale shape: per-block
    top-k pre-prune — ≤k rows leave any block — then one global
    sort+limit."""
    import math

    from .dedup import shingle_base_hash

    TWO60 = float(1 << 60)

    def keys(batch: pa.Table) -> pa.Table:
        ids, ks = [], []
        for doc_id, w in zip(
            batch["doc_id"].to_pylist(), batch[weight_col].to_pylist()
        ):
            if not w or w <= 0:
                continue
            h60 = shingle_base_hash(f"{salt}:{doc_id}")
            u = (h60 + 1) / TWO60
            ids.append(doc_id)
            ks.append(math.floor(-math.log(u) / w * 1e9))
        t = pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "key_fp9": pa.array(ks, type=pa.int64()),
            }
        )
        # block-local top-k: only k rows leave this block
        idx = pa.compute.sort_indices(
            t, sort_keys=[("key_fp9", "ascending"), ("doc_id", "ascending")]
        )[:k]
        return t.take(idx)

    picked = (
        ds.map_batches(keys, batch_format="pyarrow")
        .sort(["key_fp9", "doc_id"])
        .limit(k)
    )

    def rank(batch: pa.Table) -> pa.Table:
        # the limit(k) output is globally sorted; ranks are positional
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "key_fp9": batch["key_fp9"],
                "rk": pa.array(
                    np.arange(1, n + 1, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    import ray as _ray

    # limit(k) can span blocks; materialize to ONE block so positional
    # ranks are global (k rows — trivially small).
    return picked.repartition(1).map_batches(rank, batch_format="pyarrow")


def source_top_tokens(ds: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """(source, rk, token, n) — the k most frequent tokens WITHIN each
    source (the per-domain vocabulary-drift diagnostic: compare a
    domain's top tokens against the corpus top list to spot boilerplate
    and topical skew). Deterministic (n desc, token asc) ranking.

    Scale shape: per-batch (source, token) Counter partials collapse each
    block to ~|per-source vocab| rows, ONE keyed (source, token) groupby
    sums them, and the per-source top-k is a groupby over the already
    count-collapsed table — token payloads ride the shuffle once,
    documents never do."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in ascii_tokens(t):
                c[(src, tok)] += 1
        return pa.Table.from_pydict(
            {
                "source": pa.array([p[0] for p in c], type=pa.string()),
                "token": pa.array([p[1] for p in c], type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n"))
    )

    OUT_SCHEMA = pa.schema(
        [
            ("source", pa.string()),
            ("rk", pa.int64()),
            ("token", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group["token"].to_pylist(), group["sum(n)"].to_pylist()),
            key=lambda p: (-p[1], p[0]),
        )[:k]
        return pa.Table.from_pydict(
            {
                "source": pa.array(
                    [group["source"][0].as_py()] * len(rows), type=pa.string()
                ),
                "rk": pa.array(
                    np.arange(1, len(rows) + 1, dtype=np.int64)
                ),
                "token": pa.array([p[0] for p in rows], type=pa.string()),
                "n": pa.array([p[1] for p in rows], type=pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    return counts.groupby("source").map_groups(topk, batch_format="pyarrow")


def source_vocab_overlap(
    ds: ray.data.Dataset, vocab_size: int = 256
) -> ray.data.Dataset:
    """(source_a, source_b, n_common, n_union, jaccard_fp6) — pairwise
    Jaccard overlap of the per-source top-``vocab_size`` token sets: the
    corpus-mixing diagnostic ("how lexically distinct are my domains?")
    that guides source-mixture weights. jaccard_fp6 is the shared
    floor(a/b·1e6 + 0.5) fixed-point of two exact ints.

    Scale shape: the per-source top-V sets come from source_top_tokens'
    count-collapsed machinery (per-batch combiners, one keyed groupby);
    the pairwise comparison runs over #sources·V rows — bounded by the
    label space, driver-free via one final all-pairs map over the tiny
    collected table (sources are O(10..10^3) by construction)."""
    from . import fp

    tops = source_top_tokens(ds, k=vocab_size)

    def pairs(batch: pa.Table) -> pa.Table:
        # batch == the whole top-V table (repartition(1) below): build the
        # per-source sets and emit every ordered pair once.
        sets: dict[str, set] = {}
        for s, t in zip(batch["source"].to_pylist(), batch["token"].to_pylist()):
            sets.setdefault(s, set()).add(t)
        names = sorted(sets)
        a_, b_, nc, nu, jf = [], [], [], [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                inter = len(sets[names[i]] & sets[names[j]])
                union = len(sets[names[i]] | sets[names[j]])
                a_.append(names[i])
                b_.append(names[j])
                nc.append(inter)
                nu.append(union)
                jf.append(fp(inter / union, 6) if union else 0)
        return pa.Table.from_pydict(
            {
                "source_a": pa.array(a_, type=pa.string()),
                "source_b": pa.array(b_, type=pa.string()),
                "n_common": pa.array(nc, type=pa.int64()),
                "n_union": pa.array(nu, type=pa.int64()),
                "jaccard_fp6": pa.array(jf, type=pa.int64()),
            }
        )

    return tops.repartition(1).map_batches(
        pairs, batch_format="pyarrow", batch_size=None
    )


def canary_scan(
    ds: ray.data.Dataset, canaries: list[str]
) -> ray.data.Dataset:
    """(canary, n_docs, first_doc_id) — memorization-probe scan: for each
    canary string (the secret-sharer / training-data-extraction audit
    set), count documents whose text contains it verbatim and record the
    smallest matching doc_id. Canaries with zero hits emit no row (the
    oracle's INNER join semantics). Distinct from `decontaminate` (n-gram
    overlap vs a benchmark SET): this is exact substring search for a
    SMALL broadcast probe list, the audit a lab runs before and after
    training-data release.

    Shape: the canary list rides into every task via closure capture
    (O(#canaries) — broadcast-small by definition); per block ONE
    vectorized pc.match_substring pass per canary; only (canary, count,
    min_id) partials shuffle into a tiny keyed groupby. Text never
    leaves its block.

    Oracle: canary VALUES list JOIN documents ON contains(text, canary)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min, Sum

    PARTIAL = pa.schema(
        [
            ("canary", pa.string()),
            ("n_docs", pa.int64()),
            ("first_doc_id", pa.int64()),
        ]
    )

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        text = batch["text"]
        rows = []
        for c in canaries:
            m = pc.match_substring(text, c).to_numpy(zero_copy_only=False)
            hits = int(m.sum())
            if hits:
                rows.append(
                    {
                        "canary": c,
                        "n_docs": hits,
                        "first_doc_id": int(ids[m].min()),
                    }
                )
        return pa.Table.from_pylist(rows, schema=PARTIAL)

    return (
        ds.map_batches(scan, batch_format="pyarrow")
        .groupby("canary")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("first_doc_id", alias_name="first_doc_id"),
        )
    )


def vocab_oov_rate(ds: ray.data.Dataset, k: int = 64) -> ray.data.Dataset:
    """(source, n_tokens, n_oov, oov_fp6) — per-source out-of-vocabulary
    rate against the corpus's own top-``k`` token vocabulary: the
    tokenizer-coverage diagnostic run before committing a vocab ("which
    domain will fragment into bytes?"). oov_fp6 = n_oov * 1e6 // n_tokens
    (exact integer arithmetic, no float in the contract).

    Shape: pass 1 is token_freq's bounded top-k (partial counts, one
    keyed sum, k rows to the driver); the k-token vocab broadcasts into
    pass 2 by closure (O(k) — broadcast-small by construction), where
    each block collapses to per-source (n_tokens, n_oov) partials and
    ONE tiny keyed groupby sums them. Text scans twice but never
    shuffles; driver state is O(k + #sources).

    Oracle: top-k vocab CTE LEFT JOIN unnested tokens, GROUP BY source."""
    from ray.data.aggregate import Sum

    vocab = frozenset(
        r["token"] for r in token_freq(ds, k=k).take_all()
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(t)
            a = agg.setdefault(src, [0, 0])
            a[0] += len(toks)
            a[1] += sum(1 for w in toks if w not in vocab)
        return pa.Table.from_pydict(
            {
                "source": pa.array(list(agg.keys()), type=pa.string()),
                "n_tokens": pa.array(
                    [v[0] for v in agg.values()], type=pa.int64()
                ),
                "n_oov": pa.array(
                    [v[1] for v in agg.values()], type=pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_oov", alias_name="n_oov"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        no = batch["n_oov"].to_numpy(zero_copy_only=False)
        rate = np.where(nt > 0, (no * 1_000_000) // np.maximum(nt, 1), 0)
        return pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_tokens": pa.array(nt, type=pa.int64()),
                "n_oov": pa.array(no, type=pa.int64()),
                "oov_fp6": pa.array(rate, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("num", r"\d+", "<NUM>"),
)


def pii_scrub(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = _PII_PATTERNS,
) -> ray.data.Dataset:
    """(id, n_<name> per pattern, clean) — the pre-release PII scrub:
    count and redact emails / IPv4s / digit runs. Counts are measured on
    the ORIGINAL text per pattern (so an IP's digits also count as
    numbers — documented); redactions apply sequentially in pattern
    order, so `<EMAIL>`/`<IP>` placeholders (no digits) never re-match.

    Shape: pure per-block Arrow RE2 kernels (count_substring_regex /
    replace_substring_regex) — zero shuffle, zero driver state, output
    rides the same block layout as the input. RE2 on both sides: Arrow's
    regex engine IS DuckDB's, so the oracle is the same automaton.

    Oracle: len(regexp_extract_all) + nested regexp_replace(..., 'g')."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch[id_col]}
        clean = text
        for name, pat, rep in patterns:
            out[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(
                pa.int64()
            )
            clean = pc.replace_substring_regex(clean, pat, rep)
        out["clean"] = clean
        return pa.Table.from_pydict(out)

    return ds.map_batches(scrub, batch_format="pyarrow")


def source_divergence(ds: ray.data.Dataset, k: int = 64) -> ray.data.Dataset:
    """(source, n_tokens, tv_fp6) — per-source total-variation distance
    from the corpus unigram distribution, both restricted to the
    corpus's top-``k`` vocabulary: the domain-shift probe ("which source
    looks least like the mixture?") that complements [[dsir_weights]]'s
    importance weights with a symmetric, integer-exact distance.

    TV = 1/2 * sum_t |p_s(t) - p(t)| over vocab tokens, computed as pure
    integer arithmetic: with c_st the per-source vocab-token counts,
    n_s = sum_t c_st, N = sum_s n_s, c_t = sum_s c_st,

        tv_fp6 = (sum_t |c_st*N - c_t*n_s|) * 1e6 // (2 * n_s * N)

    where vocab tokens ABSENT from a source contribute c_t*n_s — folded
    in as (N - sum_{present} c_t) * n_s without materializing the dense
    source x vocab matrix. Python ints are arbitrary-precision; the
    oracle widens via HUGEINT.

    Shape: pass 1 is token_freq's bounded top-k; pass 2 ships only
    (source, token, count) partials into ONE keyed sum bounded by
    #sources x k rows, which the driver folds exactly.

    Oracle: vocab CTE JOIN + per-source/per-token count CTEs + the same
    integer formula."""
    from ray.data.aggregate import Sum

    vocab = frozenset(r["token"] for r in token_freq(ds, k=k).take_all())

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for w in ascii_tokens(t):
                if w in vocab:
                    c[(src, w)] += 1
        return pa.Table.from_pydict(
            {
                "source": pa.array(
                    [s for s, _ in c.keys()], type=pa.string()
                ),
                "token": pa.array([w for _, w in c.keys()], type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )  # bounded: #sources x k rows
    n_s: dict[str, int] = {}
    c_t: dict[str, int] = {}
    for r in counts:
        n_s[r["source"]] = n_s.get(r["source"], 0) + r["c"]
        c_t[r["token"]] = c_t.get(r["token"], 0) + r["c"]
    big_n = sum(n_s.values())
    present_abs: dict[str, int] = {s: 0 for s in n_s}
    present_ct: dict[str, int] = {s: 0 for s in n_s}
    for r in counts:
        s = r["source"]
        present_abs[s] += abs(r["c"] * big_n - c_t[r["token"]] * n_s[s])
        present_ct[s] += c_t[r["token"]]
    rows = sorted(n_s)
    tv = [
        (present_abs[s] + (big_n - present_ct[s]) * n_s[s])
        * 1_000_000
        // (2 * n_s[s] * big_n)
        for s in rows
    ]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "source": pa.array(rows, type=pa.string()),
                "n_tokens": pa.array([n_s[s] for s in rows], type=pa.int64()),
                "tv_fp6": pa.array(tv, type=pa.int64()),
            }
        )
    )


def _lower_median_from_hist(vals: "np.ndarray", cnts: "np.ndarray") -> int:
    """Lower median (element at 0-based index (n-1)//2 of the expanded
    sorted multiset) from a sorted value histogram."""
    n = int(cnts.sum())
    idx = (n - 1) // 2
    cum = np.cumsum(cnts)
    return int(vals[np.searchsorted(cum, idx, side="right")])


def length_outliers_mad(
    ds: ray.data.Dataset, k: int = 3
) -> ray.data.Dataset:
    """(doc_id, source, n_chars, dev) — robust per-source length
    outliers: docs whose |n_chars - median_s| exceeds k x MAD_s, where
    median is the LOWER median (index (n-1)//2) and MAD the lower median
    of absolute deviations — both exact integers, so a fat tail can't
    drag the threshold the way mean/sigma outliers do. MAD_s = 0 flags
    every off-median doc in that source (documented edge).

    Shape: pass 1 builds a per-(source, n_chars) value histogram — one
    keyed sum of payload-free partials, bounded by #sources x distinct
    lengths (the length DOMAIN, not the row count); the driver folds
    medians from the histogram and broadcasts O(#sources) thresholds by
    closure into a pass-2 stateless filter. No sort, no full-table
    driver state.

    Oracle: two ROW_NUMBER lower-median CTEs + the same inequality."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["source", "n_chars"])
            .group_by(["source", "n_chars"])
            .aggregate([("n_chars", "count")])
        )
        return pa.Table.from_pydict(
            {
                "source": g["source"],
                "n_chars": g["n_chars"].cast(pa.int64()),
                "cnt": g["n_chars_count"].cast(pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["source", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_src.setdefault(r["source"], []).append((r["n_chars"], r["cnt"]))
    thresh: dict[str, tuple[int, int]] = {}
    for s, pairs in by_src.items():
        pairs.sort()
        vals = np.array([p[0] for p in pairs], dtype=np.int64)
        cnts = np.array([p[1] for p in pairs], dtype=np.int64)
        med = _lower_median_from_hist(vals, cnts)
        devs = np.abs(vals - med)
        order = np.argsort(devs, kind="stable")
        mad = _lower_median_from_hist(devs[order], cnts[order])
        thresh[s] = (med, mad)

    def flag(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        med = np.array([thresh[s][0] for s in src], dtype=np.int64)
        mad = np.array([thresh[s][1] for s in src], dtype=np.int64)
        dev = np.abs(nc - med)
        keep = dev > k * mad
        t = batch.select(["doc_id", "source", "n_chars"]).filter(
            pa.array(keep)
        )
        return t.append_column("dev", pa.array(dev[keep], type=pa.int64()))

    return ds.map_batches(flag, batch_format="pyarrow")


def vocab_coverage_curve(
    ds: ray.data.Dataset, ks: tuple[int, ...] = (8, 16, 32, 64)
) -> ray.data.Dataset:
    """(k, covered, total, coverage_fp6) — the tokenizer-design curve:
    what fraction of all token OCCURRENCES the top-k vocabulary covers,
    for each k in ``ks``. Read together with [[vocab_oov_rate]] it
    answers "how big must the vocab be before long-tail domains stop
    fragmenting?".

    Shape: ONE bounded token_freq pass at max(ks) (per-block partial
    counts, one keyed sum, max(ks) rows out) plus a tiny total-count
    aggregate; the curve itself is O(max(ks)) driver arithmetic.
    coverage_fp6 = covered * 1e6 // total, exact integers.

    Oracle: ranked vocab CTE + one SELECT per k, UNION ALL."""
    from ray.data.aggregate import Sum

    kmax = max(ks)
    top = token_freq(ds, k=kmax).take_all()  # (token, n) desc order

    def count_partial(batch: pa.Table) -> pa.Table:
        tot = sum(len(ascii_tokens(t)) for t in batch["text"].to_pylist())
        return pa.Table.from_pydict(
            {"t": pa.array([tot], type=pa.int64())}
        )

    total = int(
        ds.map_batches(count_partial, batch_format="pyarrow").aggregate(
            Sum("t")
        )["sum(t)"]
    )
    ns = [r["n"] for r in top]
    prefix = np.cumsum(ns)
    rows_k, rows_cov = [], []
    for k in sorted(ks):
        covered = int(prefix[min(k, len(ns)) - 1]) if ns else 0
        rows_k.append(k)
        rows_cov.append(covered)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "k": pa.array(rows_k, type=pa.int64()),
                "covered": pa.array(rows_cov, type=pa.int64()),
                "total": pa.array(
                    [total] * len(rows_k), type=pa.int64()
                ),
                "coverage_fp6": pa.array(
                    [c * 1_000_000 // total if total else 0 for c in rows_cov],
                    type=pa.int64(),
                ),
            }
        )
    )


def sentence_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_docs, n_sents, sents_per_doc_fp6) — per-source sentence
    profile: a "sentence" is one run of terminal punctuation ``[.!?]+``
    (the whole-corpus mean rides as exact fixed-point n_sents*10^6 //
    n_docs). Counting is one vectorized RE2 kernel per block
    (``pc.count_substring_regex``) — the text column never leaves the
    block and only (source, 2 ints) partial rows reach the bounded
    per-source groupby.

    Oracle: len(regexp_extract_all(text, '[.!?]+')) — RE2 on both sides."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        sents = pc.count_substring_regex(batch["text"], r"[.!?]+").cast(
            pa.int64()
        )
        t = pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_sents": sents,
                "n_docs": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_sents", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_sents"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_sents", alias_name="n_sents"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].to_numpy(zero_copy_only=False)
        ns = batch["n_sents"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_docs": pa.array(nd, type=pa.int64()),
                "n_sents": pa.array(ns, type=pa.int64()),
                "sents_per_doc_fp6": pa.array(
                    ns * 1_000_000 // nd, type=pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def lexical_diversity(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_tokens, n_distinct, sum_token_chars, ttr_fp6,
    avg_len_fp6) — per-source lexical-diversity profile: type-token
    ratio (distinct / total tokens) and mean token length, both exact
    fixed-point. The vocabulary-collapse signal that separates
    template/boilerplate sources from organic text before any model
    scoring.

    Shape: each block emits (a) one (source, token) row per DISTINCT
    in-block pair with its count+charsum partials — so the keyed
    (source, token) dedup groupby receives vocab-bounded rows, never one
    row per token occurrence; (b) the per-source scalar fold then rides
    a second tiny keyed sum over the bounded source domain. Token text
    rides the shuffle ONCE per (block, distinct token).

    Oracle: COUNT / COUNT(DISTINCT) / SUM(len) per source in the same
    integer fixed-point."""
    from collections import Counter

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def pair_partials(batch: pa.Table) -> pa.Table:
        srcs, toks, ns = [], [], []
        for s, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            c = Counter(ascii_tokens(t))
            srcs.extend([s] * len(c))
            toks.extend(c.keys())
            ns.extend(c.values())
        t = pa.Table.from_pydict(
            {
                "source": pa.array(srcs, type=pa.string()),
                "token": pa.array(toks, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )
        # collapse to one row per in-block (source, token)
        g = t.group_by(["source", "token"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "token", "n"])

    per_token = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def source_partials(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch["token"]).cast(pa.int64())
        n = batch["n"].to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_tokens": pa.array(n, type=pa.int64()),
                "n_distinct": pa.array(
                    np.ones(len(n), dtype=np.int64), type=pa.int64()
                ),
                "sum_token_chars": pa.array(
                    lens.to_numpy(zero_copy_only=False) * n, type=pa.int64()
                ),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [
                ("n_tokens", "sum"),
                ("n_distinct", "sum"),
                ("sum_token_chars", "sum"),
            ]
        )
        return g.rename_columns(
            ["source", "n_tokens", "n_distinct", "sum_token_chars"]
        )

    agg = (
        per_token.map_batches(source_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("sum_token_chars", alias_name="sum_token_chars"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        nd = batch["n_distinct"].to_numpy(zero_copy_only=False)
        sc = batch["sum_token_chars"].to_numpy(zero_copy_only=False)
        safe = np.maximum(nt, 1)
        return pa.Table.from_pydict(
            {
                "source": batch["source"],
                "n_tokens": pa.array(nt, type=pa.int64()),
                "n_distinct": pa.array(nd, type=pa.int64()),
                "sum_token_chars": pa.array(sc, type=pa.int64()),
                "ttr_fp6": pa.array(nd * 1_000_000 // safe, type=pa.int64()),
                "avg_len_fp6": pa.array(
                    sc * 1_000_000 // safe, type=pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def longest_docs_per_source(
    ds: ray.data.Dataset, k: int = 3
) -> ray.data.Dataset:
    """(source, rk, doc_id, n_chars) — the per-group top-k ROWS shape:
    each source's k longest documents ranked 1..k (ties by doc_id
    ascending), emitted as rows rather than an aggregate.

    Shape: per-block per-source top-k lexsort prune → O(k · #sources ·
    #blocks) bounded rows → driver fold. Zero shuffles; the bounded
    source domain is the scale contract ([[top_customers_concat]]'s
    twin on the documents table).

    Oracle: ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars
    DESC, doc_id) <= k."""

    def block_topk(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        codes, inv = np.unique(src, return_inverse=True)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, -nch, inv))
        inv_s = inv[order]
        first = np.ones(len(inv_s), dtype=bool)
        first[1:] = inv_s[1:] != inv_s[:-1]
        run_start = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        pos = np.arange(len(inv_s)) - run_start[run_id]
        sel = order[pos < k]
        return batch.take(sel)

    rows = ds.select_columns(
        ["doc_id", "source", "n_chars"]
    ).map_batches(block_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["source"], -r["n_chars"], r["doc_id"]))
    out = {"source": [], "rk": [], "doc_id": [], "n_chars": []}
    seen: dict[str, int] = {}
    for r in rows:
        c = seen.get(r["source"], 0)
        if c < k:
            seen[r["source"]] = c + 1
            out["source"].append(r["source"])
            out["rk"].append(c + 1)
            out["doc_id"].append(r["doc_id"])
            out["n_chars"].append(r["n_chars"])
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "source": pa.array(out["source"], type=pa.string()),
                "rk": pa.array(out["rk"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "n_chars": pa.array(out["n_chars"], type=pa.int64()),
            }
        )
    )


def bigram_novelty(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_distinct, n_seen, novel_fp6) — per-document n-gram
    novelty vs the ID-ordered corpus prefix: the fraction of a doc's
    DISTINCT word bigrams whose first corpus occurrence (min doc_id over
    docs containing the bigram) is an EARLIER document. The memorization
    / staleness probe a crawl-curation pipeline runs on each new snapshot
    — low novelty means the doc re-treads already-collected text.

    Scale shape (the rare_bigram_rate skeleton): docs explode to one
    (bh, doc_id) row per DISTINCT bigram (shared 60-bit md5 hash; text
    never rides); ONE keyed bh groupby emits a seen-mark per row whose
    doc_id exceeds the group min; marks ride a tagged union with per-doc
    distinct totals into a second int-only doc_id groupby. Docs with
    fewer than two tokens have no bigrams and are absent (both sides).

    Oracle: DISTINCT unnested bigrams, MIN() OVER per hash, same fp6."""
    from ray.data.aggregate import Sum

    from .dedup import shingle_base_hash

    MERGE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("n_distinct", pa.int64()), ("n_seen", pa.int64())]
    )

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = ascii_tokens(t)
            for bg in {toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)}:
                out_h.append(shingle_base_hash(bg))
                out_d.append(d)
        return pa.Table.from_pydict(
            {
                "bh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
            }
        )

    def totals(batch: pa.Table) -> pa.Table:
        ids, nd = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = ascii_tokens(t)
            n = len({toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)})
            if n > 0:
                ids.append(d)
                nd.append(n)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_distinct": pa.array(nd, type=pa.int64()),
                "n_seen": pa.array([0] * len(ids), type=pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    def seen_marks(group: pa.Table) -> pa.Table:
        import numpy as np

        d = group["doc_id"].to_numpy(zero_copy_only=False)
        seen = d[d > d.min()]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(seen, type=pa.int64()),
                "n_distinct": pa.array([0] * len(seen), type=pa.int64()),
                "n_seen": pa.array([1] * len(seen), type=pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    marks = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bh")
        .map_groups(seen_marks, batch_format="pyarrow")
    )
    merged = (
        ds.map_batches(totals, batch_format="pyarrow")
        .union(marks)
        .groupby("doc_id")
        .aggregate(Sum("n_distinct"), Sum("n_seen"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        nd = batch["sum(n_distinct)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = batch["sum(n_seen)"].to_numpy(zero_copy_only=False).astype(np.int64)
        novel = np.floor((nd - ns).astype(np.float64) * 1e6 / nd + 0.5).astype(
            np.int64
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_distinct": pa.array(nd),
                "n_seen": pa.array(ns),
                "novel_fp6": pa.array(novel),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def quality_length_grid(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(alpha_bucket, len_bucket, n_docs, sum_chars) — 2-D calibration
    grid of document quality vs length: alpha-ratio in 10 fixed-width
    buckets (``min(alpha_fp6 // 10^5, 9)``) crossed with length in
    256-char buckets capped at 15 (``min(n_chars // 256, 15)``). The
    filter-threshold tuning artifact: a curation team reads the grid to
    see whether low-alpha docs are concentrated in a length band before
    committing a Gopher-style cutoff. Fixed integer bucket edges — no
    global quantile pass, so the whole grid is one map + ONE ≤160-row
    keyed combiner sum ([[doc_length_deciles]] is the global-rank twin).

    Oracle: same bucket arithmetic, GROUP BY both buckets."""
    from ray.data.aggregate import Sum

    q = quality_score(ds)

    def bucket_partial(batch: pa.Table) -> pa.Table:
        alpha = batch["alpha_fp6"].to_numpy(zero_copy_only=False)
        n_chars = batch["n_chars_t"].to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict(
            {
                "alpha_bucket": pa.array(
                    np.minimum(alpha // 100_000, 9), type=pa.int64()
                ),
                "len_bucket": pa.array(
                    np.minimum(n_chars // 256, 15), type=pa.int64()
                ),
                "n_docs": pa.array(np.ones(len(alpha), dtype=np.int64)),
                "sum_chars": pa.array(n_chars, type=pa.int64()),
            }
        )
        g = t.group_by(["alpha_bucket", "len_bucket"]).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(
            ["alpha_bucket", "len_bucket", "n_docs", "sum_chars"]
        )

    return (
        q.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby(["alpha_bucket", "len_bucket"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


def source_token_gini(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_tokens, n_distinct, gini_fp6) — vocabulary
    concentration per source: the Gini impurity of the source's token
    frequency distribution in the [[user_type_gini]] pure-rational
    contract (``((n²−Σc²)·2·10⁶+n²)//(2n²)``, no float division). The
    vocabulary-collapse detector: a spam or template source re-emitting
    a handful of tokens scores near 0 while healthy prose sits high —
    read next to [[source_vocab_overlap]] before setting mixture
    weights.

    Scale shape: per-block (source, token-hash) count pre-combine (the
    60-bit md5 [[shingle_base_hash]]; token strings never ride), ONE
    keyed (source, hash) sum, an in-block collapse to per-source
    (n, Σc², distinct) partials and ONE tiny source groupby. Hash
    collisions are part of the contract on both sides."""
    from ray.data.aggregate import Sum

    from .dedup import shingle_base_hash

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_s: list[str] = []
        out_h: list[int] = []
        out_c: list[int] = []
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok, c in Counter(ascii_tokens(t)).items():
                out_s.append(src)
                out_h.append(shingle_base_hash(tok))
                out_c.append(c)
        return pa.Table.from_pydict(
            {
                "source": pa.array(out_s, type=pa.string()),
                "th": pa.array(out_h, type=pa.int64()),
                "c": pa.array(out_c, type=pa.int64()),
            }
        )

    per_token = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["source", "th"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def square_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.Table.from_pydict(
            {
                "source": batch["source"].cast(pa.string()),
                "n": pa.array(c, type=pa.int64()),
                "s2": pa.array(c * c, type=pa.int64()),
                "d": pa.array(np.ones(len(c), dtype=np.int64)),
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("n", "sum"), ("s2", "sum"), ("d", "sum")]
        )
        return g.rename_columns(["source", "n", "s2", "d"])

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(object)
        s2 = batch["s2"].to_numpy(zero_copy_only=False).astype(object)
        gini = [
            int(((nn * nn - ss) * 2_000_000 + nn * nn) // (2 * nn * nn))
            for nn, ss in zip(n, s2)
        ]
        return pa.Table.from_pydict(
            {
                "source": batch["source"].cast(pa.string()),
                "n_tokens": batch["n"].cast(pa.int64()),
                "n_distinct": batch["d"].cast(pa.int64()),
                "gini_fp6": pa.array(gini, type=pa.int64()),
            }
        )

    return (
        per_token.map_batches(square_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s2", alias_name="s2"),
            Sum("d", alias_name="d"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def compression_ratio(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bytes, n_zlib, ratio_fp4) — the Gopher/C4 compression-
    ratio quality signal: zlib-compressed size over raw UTF-8 size,
    fixed-point 1e4. Highly repetitive (template/spam) text compresses
    far below prose; filter thresholds come from [[quality_length_grid]]
    -style calibration. DEFLATE is not expressible in SQL, so this query
    is rows-only checked (the [[dehyphenate]] precedent); level is
    pinned for cross-run determinism.

    Scale shape: pure per-batch map, zero shuffles."""
    import zlib

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_raw: list[int] = []
        n_z: list[int] = []
        ratio: list[int] = []
        for t in batch["text"].to_pylist():
            raw = t.encode("utf-8")
            z = zlib.compress(raw, 6)
            n_raw.append(len(raw))
            n_z.append(len(z))
            ratio.append(
                int(np.floor(len(z) * 1e4 / len(raw) + 0.5)) if raw else 0
            )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_raw, type=pa.int64()),
                "n_zlib": pa.array(n_z, type=pa.int64()),
                "ratio_fp4": pa.array(ratio, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def source_token_entropy(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_tokens, n_distinct, ent_fp6) — Shannon entropy (nats)
    of each source's token frequency distribution:
    H = ln(N) − (Σ c·ln c)/N. The companion to [[source_token_gini]]'s
    impurity: entropy separates "few tokens dominate" (low H) from
    "flat vocabulary" (H near ln of distinct count) with the standard
    information-theoretic scale, which makes cross-source comparisons
    additive (mixture entropy bounds) where Gini is not.

    Exact-replay contract (the dsir/PMI discipline): the per-token term
    floor(c·ln(c)·1e6) quantizes to int64 BEFORE summation, so the fold
    is order-independent; ln is platform libm in both engines; the final
    expression ln(N) − (S/1e6)/N evaluates as ONE fixed IEEE-double
    sequence then floors to fp6. int64 bound: c·ln(c)·1e6 ≈ 1.6e14 at
    c = 1e7 — exact to ~6e4 such hot tokens per source; beyond, rescale
    the quantum.

    Scale shape: identical to [[source_token_gini]] — per-block
    (source, token-hash) pre-combine (60-bit md5, strings never ride),
    ONE keyed (source, hash) sum, in-block collapse to per-source
    (n, S, distinct) partials, ONE tiny source groupby."""
    from ray.data.aggregate import Sum

    from .dedup import shingle_base_hash

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_s: list[str] = []
        out_h: list[int] = []
        out_c: list[int] = []
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok, c in Counter(ascii_tokens(t)).items():
                out_s.append(src)
                out_h.append(shingle_base_hash(tok))
                out_c.append(c)
        return pa.Table.from_pydict(
            {
                "source": pa.array(out_s, type=pa.string()),
                "th": pa.array(out_h, type=pa.int64()),
                "c": pa.array(out_c, type=pa.int64()),
            }
        )

    per_token = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["source", "th"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def term_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.floor(
            c.astype(np.float64) * np.log(c.astype(np.float64)) * 1e6
        ).astype(np.int64)
        t = pa.Table.from_pydict(
            {
                "source": batch["source"].cast(pa.string()),
                "pn": pa.array(c, type=pa.int64()),
                "ps": pa.array(terms, type=pa.int64()),
                "pd": pa.array(np.ones(len(c), dtype=np.int64)),
            }
        )
        return t.group_by("source").aggregate(
            [("pn", "sum"), ("ps", "sum"), ("pd", "sum")]
        )

    agg = (
        per_token.map_batches(term_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("pn_sum", alias_name="n"),
            Sum("ps_sum", alias_name="s"),
            Sum("pd_sum", alias_name="d"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        dct = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        ent = np.floor(
            (np.log(n.astype(np.float64))
             - (s.astype(np.float64) / 1e6) / n.astype(np.float64)) * 1e6
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "source": batch["source"].cast(pa.string()),
                "n_tokens": pa.array(n, type=pa.int64()),
                "n_distinct": pa.array(dct, type=pa.int64()),
                "ent_fp6": pa.array(ent, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def readability_scores(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_words, n_sentences, n_syllables, flesch_fp3) — Flesch
    reading-ease per document with a regex syllable proxy (vowel-group
    runs), the cheap fluency gate corpus filters run next to
    [[quality_score]]: very low scores flag run-on machine-generated
    prose, very high ones flag fragment/listicle noise.

    Proxy definitions (identical regexes both engines): words =
    whitespace tokens; sentences = runs of [.!?]; syllables = runs of
    [aeiouyAEIOUY]. flesch = 206.835 − 1.015·(W/max(S,1)) −
    84.6·(Y/max(W,1)) evaluated as ONE fixed IEEE-double sequence over
    exact int counts, floored to fp3. Embarrassingly parallel — no
    shuffle, text never leaves its block."""
    import re

    sent_re = re.compile(r"[.!?]+")
    syl_re = re.compile(r"[aeiouyAEIOUY]+")

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        w = np.empty(len(texts), dtype=np.int64)
        s = np.empty(len(texts), dtype=np.int64)
        y = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            w[i] = len(ascii_tokens(t))
            s[i] = len(sent_re.findall(t))
            y[i] = len(syl_re.findall(t))
        flesch = np.floor(
            (
                206.835
                - 1.015 * (w.astype(np.float64) / np.maximum(s, 1))
                - 84.6 * (y.astype(np.float64) / np.maximum(w, 1))
            )
            * 1e3
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": pa.array(w, type=pa.int64()),
                "n_sentences": pa.array(s, type=pa.int64()),
                "n_syllables": pa.array(y, type=pa.int64()),
                "flesch_fp3": pa.array(flesch, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def quality_blend_rank(ds: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """(rk, doc_id, r_quality, r_fluency, blend) — ensemble curation
    shortlist: each document's GLOBAL rank under two independent quality
    signals — [[quality_score]]'s alpha ratio (descending: more letters
    = better) and [[lm_perplexity]]'s mean NLL (ascending: more fluent =
    better) — summed into a Borda-count blend; the ``k`` best blends
    win. Rank blending is the standard way to ensemble incommensurable
    quality scores without calibrating either (Borda fusion), and is
    exactly replayable where score averaging is not.

    Shape: both signals are shuffle-free per-doc maps; each global rank
    is ONE sort + the O(#blocks) block-offset pass
    ([[global_row_number]]); ranks join on doc_id through the shared
    guarded-attach core; the final top-k is a tiny sort-limit on int
    rows (payloads never ride).

    Oracle: two ROW_NUMBER() windows over the composed signal oracles,
    joined and limited identically."""
    import pyarrow.compute as _pc

    from .exchange import global_row_number
    from .relational import keyed_attach_int
    from .selection import lm_perplexity

    q = quality_score(ds)

    def neg_alpha(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "neg_alpha": _pc.negate(batch["alpha_fp6"].cast(pa.int64())),
            }
        )

    rq = global_row_number(
        q.map_batches(neg_alpha, batch_format="pyarrow"),
        ["neg_alpha", "doc_id"],
    ).select_columns(["doc_id", "r"])

    lm = lm_perplexity(ds)
    rl = global_row_number(
        lm.select_columns(["mean_nll_fp9", "doc_id"]),
        ["mean_nll_fp9", "doc_id"],
    ).select_columns(["doc_id", "r"])

    def as_fact(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "r_quality": batch["r"].cast(pa.int64()),
            }
        )

    def as_dim(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "r_fluency": batch["r"].cast(pa.int64()),
            }
        )

    joined = keyed_attach_int(
        rq.map_batches(as_fact, batch_format="pyarrow"),
        rl.map_batches(as_dim, batch_format="pyarrow"),
        "doc_id",
        "r_fluency",
        ("r_quality",),
    )

    def add_blend(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "blend",
            _pc.add(
                batch["r_quality"].cast(pa.int64()),
                batch["r_fluency"].cast(pa.int64()),
            ),
        )

    top = (
        joined.map_batches(add_blend, batch_format="pyarrow")
        .sort(["blend", "doc_id"])
        .limit(k)
        .take_all()
    )  # bounded: k rows
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "rk": pa.array(range(1, len(top) + 1), type=pa.int64()),
                "doc_id": pa.array(
                    [r["doc_id"] for r in top], type=pa.int64()
                ),
                "r_quality": pa.array(
                    [r["r_quality"] for r in top], type=pa.int64()
                ),
                "r_fluency": pa.array(
                    [r["r_fluency"] for r in top], type=pa.int64()
                ),
                "blend": pa.array([r["blend"] for r in top], type=pa.int64()),
            }
        )
    )


def tokenizer_fertility(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n_docs, n_words, n_bpe, fertility_fp6) — per-language
    tokenizer FERTILITY: BPE-ish regex tokens per whitespace word
    (the multilingual-data budgeting metric — a language whose
    fertility is 2× pays 2× the context window per word; Ács/Rust et
    al.'s subword-fertility diagnostic). Word contract = ascii_tokens,
    subtoken contract = TOKEN_REGEX — both shared with their stats
    siblings so the oracle regexes are already parity-proven.

    Shape: per-block (lang, counts) partials, ONE tiny lang-keyed sum,
    integer fp6 ratio at the end. Nothing but 4-int rows shuffle.

    Oracle: the two regexp_extract_all counts grouped by lang."""
    import re

    from ray.data.aggregate import Sum

    tok_re = re.compile(TOKEN_REGEX)

    def partial(batch: pa.Table) -> pa.Table:
        langs: dict[str, list[int]] = {}
        for lang, t in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
            acc = langs.setdefault(lang, [0, 0, 0])
            acc[0] += 1
            acc[1] += len(ascii_tokens(t))
            acc[2] += len(tok_re.findall(t))
        return pa.Table.from_pydict(
            {
                "lang": pa.array(list(langs), type=pa.string()),
                "n_docs": pa.array([v[0] for v in langs.values()], type=pa.int64()),
                "n_words": pa.array([v[1] for v in langs.values()], type=pa.int64()),
                "n_bpe": pa.array([v[2] for v in langs.values()], type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_bpe", alias_name="n_bpe"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        w = batch["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["n_bpe"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "lang": batch["lang"],
                "n_docs": batch["n_docs"].cast(pa.int64()),
                "n_words": pa.array(w, type=pa.int64()),
                "n_bpe": pa.array(b, type=pa.int64()),
                "fertility_fp6": pa.array(
                    np.where(w > 0, b * 1_000_000 // np.maximum(w, 1), 0),
                    type=pa.int64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def quality_ntile_by_source(
    ds: ray.data.Dataset, n_tiles: int = 4
) -> ray.data.Dataset:
    """(doc_id, source, alpha_fp6, tile) — each document's quality
    QUARTILE (n_tiles-tile) WITHIN its source, SQL NTILE semantics
    (first cnt % n tiles take the extra row), ordered by
    (alpha_fp6, doc_id) ascending — the per-source curriculum/balance
    bucketing a mixture planner consumes ("drop every source's bottom
    quartile" without letting a high-quality source starve).

    Shape: alpha ratio per block, ONE global sort by (source,
    alpha_fp6, doc_id) + the [[global_row_number]] block-offset rank
    (rows never move after the sort), per-source (first-rank, count)
    from a tiny aggregate — sources are a LOW-cardinality dimension
    (the corpus catalog axis), so the per-source table broadcasts in
    one ray.put; the tile is then pure vectorized arithmetic. The
    NTILE formula is spelled out instead of a per-source map_groups.

    Oracle: NTILE(n) OVER (PARTITION BY source ORDER BY alpha_fp6,
    doc_id)."""
    import re

    import ray as _ray
    from ray.data.aggregate import Count, Min

    from . import fp
    from .exchange import global_row_number

    alpha_re = re.compile(f"[{ALPHA_CLASS}]")

    def score(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            total = len(t)
            out.append(fp(len(alpha_re.findall(t)) / total, 6) if total else 0)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "alpha_fp6": pa.array(out, type=pa.int64()),
            }
        )

    ranked = global_row_number(
        ds.map_batches(score, batch_format="pyarrow"),
        ["source", "alpha_fp6", "doc_id"],
    ).materialize()
    per_source = ranked.groupby("source").aggregate(
        Min("r", alias_name="r0"), Count()
    )
    srcs = {
        row["source"]: (int(row["r0"]), int(row["count()"]))
        for row in per_source.take_all()
    }  # low-cardinality dim (catalog axis)
    ref = _ray.put(srcs)

    def tile(batch: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        src = batch["source"].to_pylist()
        r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        r0 = np.fromiter((m[s][0] for s in src), dtype=np.int64, count=len(src))
        cnt = np.fromiter((m[s][1] for s in src), dtype=np.int64, count=len(src))
        rank = r - r0  # 0-based within source
        base = cnt // n_tiles
        rem = cnt % n_tiles
        big = rem * (base + 1)
        t = np.where(
            rank < big,
            rank // np.maximum(base + 1, 1),
            rem + (rank - big) // np.maximum(base, 1),
        ) + 1
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "source": batch["source"],
                "alpha_fp6": batch["alpha_fp6"].cast(pa.int64()),
                "tile": pa.array(t, type=pa.int64()),
            }
        )

    return ranked.map_batches(tile, batch_format="pyarrow")


def zipf_fit(ds: ray.data.Dataset, k: int = 64) -> ray.data.Dataset:
    """(source, n_top, zipf_fp6) — per-source Zipf exponent: OLS slope of
    ln(count) on ln(rank) over the source's top-``k`` tokens
    (rank tie-break = [[source_top_tokens]]'s (n desc, token asc)),
    reported as the NEGATED slope s (ideal natural text has s ≈ 1).
    The power-law health check corpus curators run next to
    [[source_token_entropy]]: machine-generated / templated sources
    show a visibly flatter (s « 1) or steeper (s » 1) head than
    organic prose, which entropy alone can't localize to the head.

    Exact-replay contract (the dsir/PMI discipline): per-rank terms are
    quantized to int64 BEFORE any summation — xq = floor(ln(r)·1e6),
    yq = floor(ln(n)·1e6) — so Sx, Sy, Sxy, Sxx are exact integers and
    order-independent; slope = double(m·Sxy − Sx·Sy) / double(m·Sxx −
    Sx²) is ONE fixed IEEE division (explicit double casts both
    engines), then zipf_fp6 = floor(−slope·1e6). int64 bounds: at
    k = 64 and counts ≤ 1e12, m·Sxy ≤ 4.7e17 < 2⁶³.

    Scale shape: identical to [[source_top_tokens]] — per-block
    (source, token) Counter partials collapse each block to per-source
    vocab rows, ONE keyed (source, token) groupby sums them, and the
    top-k + OLS runs per source over the already count-collapsed table;
    documents never ride the exchange. Sources with fewer than 2
    distinct tokens (degenerate den = 0) are dropped by contract."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in ascii_tokens(t):
                c[(src, tok)] += 1
        return pa.Table.from_pydict(
            {
                "source": pa.array([p[0] for p in c], type=pa.string()),
                "token": pa.array([p[1] for p in c], type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("n"))
    )

    OUT_SCHEMA = pa.schema(
        [
            ("source", pa.string()),
            ("n_top", pa.int64()),
            ("zipf_fp6", pa.int64()),
        ]
    )

    def fit(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group["token"].to_pylist(), group["sum(n)"].to_pylist()),
            key=lambda p: (-p[1], p[0]),
        )[:k]
        m = len(rows)
        if m < 2:
            return pa.Table.from_pydict(
                {"source": [], "n_top": [], "zipf_fp6": []}, schema=OUT_SCHEMA
            )
        r = np.arange(1, m + 1, dtype=np.float64)
        n = np.array([p[1] for p in rows], dtype=np.float64)
        xq = np.floor(np.log(r) * 1e6).astype(np.int64)
        yq = np.floor(np.log(n) * 1e6).astype(np.int64)
        sx = int(xq.sum())
        sy = int(yq.sum())
        sxy = int((xq * yq).sum())
        sxx = int((xq * xq).sum())
        num = m * sxy - sx * sy
        den = m * sxx - sx * sx
        if den == 0:
            return pa.Table.from_pydict(
                {"source": [], "n_top": [], "zipf_fp6": []}, schema=OUT_SCHEMA
            )
        slope = float(num) / float(den)
        return pa.Table.from_pydict(
            {
                "source": pa.array(
                    [group["source"][0].as_py()], type=pa.string()
                ),
                "n_top": pa.array([m], type=pa.int64()),
                "zipf_fp6": pa.array(
                    [int(np.floor(-slope * 1e6))], type=pa.int64()
                ),
            },
            schema=OUT_SCHEMA,
        )

    return counts.groupby("source").map_groups(fit, batch_format="pyarrow")


def bpe_merge_step(ds: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """(left_sym, right_sym, n) — the top-k merge candidates of ONE BPE
    training step: corpus-wide counts of adjacent character pairs inside
    whitespace tokens, weighted by token frequency ("aaa" contributes
    (a,a) twice). The inner loop of byte-pair-encoding tokenizer
    training (Sennrich et al. 2016), whose scale discipline is that the
    pair statistics come from the VOCABULARY, not the corpus: per-batch
    token Counter partials collapse each block to ~vocab-size rows
    ([[token_freq]]'s plan), ONE bounded keyed sum builds the word-freq
    table, and the pair expansion + second tiny groupby run over those
    ≤|V| rows — documents never ride a shuffle, and iterating the merge
    loop re-uses the same exchange. Total order (n desc, pair asc)
    pins the k-boundary for the oracle."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def word_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(ascii_tokens(t))
        return pa.Table.from_pydict(
            {
                "w": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    words = (
        ds.map_batches(word_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        pc_: Counter = Counter()
        for w, c in zip(batch["w"].to_pylist(), batch["c"].to_pylist()):
            for i in range(len(w) - 1):
                pc_[(w[i], w[i + 1])] += int(c)
        return pa.Table.from_pydict(
            {
                "left_sym": pa.array(
                    [p[0] for p in pc_], type=pa.string()
                ),
                "right_sym": pa.array(
                    [p[1] for p in pc_], type=pa.string()
                ),
                "n": pa.array(list(pc_.values()), type=pa.int64()),
            }
        )

    pairs = (
        words.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["left_sym", "right_sym"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return pairs.sort(
        ["n", "left_sym", "right_sym"], descending=[True, False, False]
    ).limit(k)


def lang_id_confusion(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, pred_lang, n) — confusion matrix of the [[lang_id]]
    heuristic against the corpus's labeled ``lang`` column: the
    eval-the-filter step a pipeline runs BEFORE trusting a cheap
    language gate to route 10¹² documents (precision/recall per label
    fall out of the matrix). Same Cyrillic-share predictor as lang_id
    (>30% non-space chars in [Ѐ-ӿ] → 'cyr'), counted per (true,
    predicted) cell: per-block prediction + Counter partials → ONE
    ≤|langs|²-row keyed sum; text never shuffles."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        space_re = _space_re()
        c: Counter = Counter()
        for lang, t in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            chars = space_re.sub("", t)
            n_cyr = sum(1 for ch in chars if "Ѐ" <= ch <= "ӿ")
            pred = (
                "cyr" if chars and n_cyr * 10 > 3 * len(chars) else "lat"
            )
            c[(lang, pred)] += 1
        return pa.Table.from_pydict(
            {
                "lang": pa.array([k[0] for k in c], type=pa.string()),
                "pred_lang": pa.array(
                    [k[1] for k in c], type=pa.string()
                ),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n"))
    )


CODE_SYM_RE = r"[\[\]{}();=<>+*/&|%#_$@^-]"


def code_detect(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars_t, sym_chars, n_lines, indent_lines, looks_code)
    — code-vs-prose gate: symbol-character density and indented-line
    share, the two structural signals that separate source code from
    natural text without any language model. looks_code is the pure
    integer cross-multiplied rule (no float thresholds, the
    [[gopher_filter]] convention):

        sym_chars·20 > n_chars  (>5% symbol chars)   OR
        indent_lines·4 > n_lines (>25% of lines indented 4sp/tab)

    The routing decision every mixed web corpus makes before tokenizer
    and mixture choices (code gets different dedup + quality rules).
    Pure per-doc map_batches, zero shuffle; the symbol class and line
    split are verified expression-equal in RE2/DuckDB."""
    import re

    sym_re = re.compile(CODE_SYM_RE)

    def batch_fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "n_chars_t": [], "sym_chars": [], "n_lines": [],
            "indent_lines": [], "looks_code": [],
        }
        for t in batch["text"].to_pylist():
            sym = len(sym_re.findall(t))
            lines = t.split("\n")
            ind = sum(
                1
                for ln in lines
                if ln.startswith("    ") or ln.startswith("\t")
            )
            cols["n_chars_t"].append(len(t))
            cols["sym_chars"].append(sym)
            cols["n_lines"].append(len(lines))
            cols["indent_lines"].append(ind)
            cols["looks_code"].append(
                sym * 20 > len(t) or ind * 4 > len(lines)
            )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_chars_t": pa.array(cols["n_chars_t"], type=pa.int64()),
                "sym_chars": pa.array(cols["sym_chars"], type=pa.int64()),
                "n_lines": pa.array(cols["n_lines"], type=pa.int64()),
                "indent_lines": pa.array(
                    cols["indent_lines"], type=pa.int64()
                ),
                "looks_code": pa.array(
                    cols["looks_code"], type=pa.bool_()
                ),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def kneser_ney_bigram(ds: ray.data.Dataset, k: int = 50) -> ray.data.Dataset:
    """(w1, w2, c12, c1, r1, l2, t_types, p_fp9) — interpolated
    Kneser–Ney bigram probabilities (discount d = 3/4) for the corpus's
    top-``k`` bigrams (by count, ties to (w1, w2) lexicographic) — the
    classic n-gram LM estimate whose continuation counts (how many
    DISTINCT contexts a word follows) are the canonical "is this word
    productive or boilerplate?" signal for training-data prep:

        P_KN(w2|w1) = (c12 − d)/c1 + (d·r1/c1) · (l2/T)

    with c1 = Σ_w c(w1,w), r1 = N1+(w1·), l2 = N1+(·w2), T = total
    distinct bigram types. With d = 3/4 the whole estimate is one exact
    rational — p_fp9 = ((4·c12 − 3)·T + 3·r1·l2)·10⁹ // (4·c1·T) —
    computed with Python ints on the k final rows (the products exceed
    int64 at web scale; the oracle widens via HUGEINT).

    Shape: ONE tokenize pass emits per-block (w1, w2, count) dict
    partials → [[keyed_fold]] on the pair → the type table; c1/r1 fold
    per w1 and l2 per w2 are derived from the TYPE table (already
    distinct, far smaller than the token stream); the top-k pick is a
    per-block top-k prune + O(k·#blocks) driver merge (no all-to-all
    sort for k output rows), and the ≤k needed c1/r1/l2 rows come back via broadcast
    semi-join filters, never a full collect."""
    from .exchange import keyed_fold

    def bigram_partial(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        for t in batch["text"].to_pylist():
            ws = ascii_tokens(t)
            for a, b in zip(ws, ws[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        ks = list(counts)
        return pa.Table.from_pydict(
            {
                "w1": pa.array([a for a, _ in ks], type=pa.string()),
                "w2": pa.array([b for _, b in ks], type=pa.string()),
                "c": pa.array(
                    [counts[x] for x in ks], type=pa.int64()
                ),
            }
        )

    bg = keyed_fold(
        ds.map_batches(bigram_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        [("c", "sum")],
    ).materialize()
    t_types = int(bg.count())
    if t_types == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "c12": pa.array([], type=pa.int64()),
                    "c1": pa.array([], type=pa.int64()),
                    "r1": pa.array([], type=pa.int64()),
                    "l2": pa.array([], type=pa.int64()),
                    "t_types": pa.array([], type=pa.int64()),
                    "p_fp9": pa.array([], type=pa.int64()),
                }
            )
        )
    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        c = batch["c"].to_numpy(zero_copy_only=False)
        w1 = np.array(batch["w1"].to_pylist())
        w2 = np.array(batch["w2"].to_pylist())
        order = np.lexsort((w2, w1, -c))[:k]
        return batch.take(pa.array(order))

    # per-block top-k prune -> O(k x #blocks) driver merge; the global
    # sort-limit of the full TYPE table would be an all-to-all shuffle
    # for k rows of output.
    top = sorted(
        bg.map_batches(block_topk, batch_format="pyarrow").take_all(),
        key=lambda r: (-r["c"], r["w1"], r["w2"]),
    )[:k]

    def left_stats(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "w1": batch["w1"],
                "c": batch["c"],
                "one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )

    c1r1 = keyed_fold(
        bg.map_batches(left_stats, batch_format="pyarrow"),
        "w1",
        [("c", "sum"), ("one", "sum")],
    )
    l2f = keyed_fold(
        bg.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "w2": b["w2"],
                    "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "w2",
        [("one", "sum")],
    )
    w1_ref = ray.put({r["w1"] for r in top})
    w2_ref = ray.put({r["w2"] for r in top})

    def pick(col: str, ref):
        def f(b: pa.Table) -> pa.Table:
            want = ray.get(ref)
            mask = pa.array(
                [v in want for v in b[col].to_pylist()], type=pa.bool_()
            )
            return b.filter(mask)

        return f

    c1_map = {
        r["w1"]: (r["c"], r["one"])
        for r in c1r1.map_batches(
            pick("w1", w1_ref), batch_format="pyarrow"
        ).take_all()
    }
    l2_map = {
        r["w2"]: r["one"]
        for r in l2f.map_batches(
            pick("w2", w2_ref), batch_format="pyarrow"
        ).take_all()
    }
    rows = []
    for r in top:
        c12 = int(r["c"])
        c1, r1 = (int(x) for x in c1_map[r["w1"]])
        l2 = int(l2_map[r["w2"]])
        p_fp9 = ((4 * c12 - 3) * t_types + 3 * r1 * l2) * 10**9 // (
            4 * c1 * t_types
        )
        rows.append((r["w1"], r["w2"], c12, c1, r1, l2, t_types, p_fp9))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "w1": pa.array([x[0] for x in rows], type=pa.string()),
                "w2": pa.array([x[1] for x in rows], type=pa.string()),
                "c12": pa.array([x[2] for x in rows], type=pa.int64()),
                "c1": pa.array([x[3] for x in rows], type=pa.int64()),
                "r1": pa.array([x[4] for x in rows], type=pa.int64()),
                "l2": pa.array([x[5] for x in rows], type=pa.int64()),
                "t_types": pa.array(
                    [x[6] for x in rows], type=pa.int64()
                ),
                "p_fp9": pa.array([x[7] for x in rows], type=pa.int64()),
            }
        )
    )


def corpus_datasheet(ds: ray.data.Dataset) -> ray.data.Dataset:
    """ONE datasheet row — (n_docs, total_chars, total_tokens,
    n_sources, n_langs, n_unique_texts, dup_ppm, vocab_size) — the
    "datasheet for datasets" header block every corpus release carries:
    scale, composition breadth, exact-duplicate load (dup_ppm =
    (n_docs − n_unique)·10⁶ // n_docs) and vocabulary size, all exact
    integers from ONE fused pass + two bounded folds.

    Shape: a single map_batches reads and tokenizes each block ONCE and
    emits a tagged partial table (k=0 text-hash rows, k=1 per-block-
    distinct token-hash rows, k=2 one stats row with counts + bounded
    source/lang set partials), materialized once; the two distinct
    counts that are NOT domain-bounded — unique texts and vocabulary —
    then ride as 60-bit md5 hashes through [[keyed_fold]] exchanges
    (each fold input re-projects to 8-byte (h, one) rows, so the
    SHUFFLES stay hash-only; text/tokens themselves never ship), and
    the k=2 stats rows fold on the driver (O(#blocks)). 60-bit hash
    collisions undercount uniques at ~n²/2⁶¹ — the same documented
    contract as [[dedup_exact]]'s md5 keys (vocab_size counts distinct
    token HASHES, mirrored in the oracle)."""
    import hashlib

    import pyarrow.compute as pc

    from .exchange import keyed_fold

    def fused_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        th = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for t in texts
        ]
        vocab: set = set()
        toks = 0
        for t in texts:
            ws = ascii_tokens(t)
            toks += len(ws)
            vocab.update(ws)
        vh = [
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for w in vocab
        ]
        m = len(th) + len(vh)
        zeros = np.zeros(m, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "k": pa.array(
                    [0] * len(th) + [1] * len(vh) + [2], type=pa.int8()
                ),
                "h": pa.array(th + vh + [0], type=pa.int64()),
                "n": pa.array(
                    np.append(zeros, batch.num_rows), type=pa.int64()
                ),
                "chars": pa.array(
                    np.append(zeros, sum(len(t) for t in texts)),
                    type=pa.int64(),
                ),
                "toks": pa.array(np.append(zeros, toks), type=pa.int64()),
                "sources": pa.array(
                    [[]] * m
                    + [sorted(set(batch["source"].to_pylist()))],
                    type=pa.list_(pa.string()),
                ),
                "langs": pa.array(
                    [[]] * m
                    + [sorted(set(batch["lang"].to_pylist()))],
                    type=pa.list_(pa.string()),
                ),
            }
        )

    tagged = ds.map_batches(
        fused_partial, batch_format="pyarrow"
    ).materialize()

    def _hash_rows(kind: int):
        def sel(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["k"], kind))
            return pa.Table.from_pydict(
                {
                    "h": t["h"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )

        return sel

    def _distinct_count(kind: int) -> int:
        fold = keyed_fold(
            tagged.map_batches(_hash_rows(kind), batch_format="pyarrow"),
            "h",
            [("one", "min")],
        )
        return sum(
            r["c"]
            for r in fold.map_batches(
                lambda b: pa.Table.from_pydict(
                    {"c": pa.array([b.num_rows], type=pa.int64())}
                ),
                batch_format="pyarrow",
            ).take_all()
        )

    n_unique = _distinct_count(0)
    vocab_size = _distinct_count(1)

    n_docs = total_chars = total_toks = 0
    sources: set = set()
    langs: set = set()
    for r in tagged.map_batches(
        lambda b: b.filter(pc.equal(b["k"], 2)).select(
            ["n", "chars", "toks", "sources", "langs"]
        ),
        batch_format="pyarrow",
    ).take_all():
        n_docs += r["n"]
        total_chars += r["chars"]
        total_toks += r["toks"]
        sources.update(r["sources"])
        langs.update(r["langs"])
    dup_ppm = (
        (n_docs - n_unique) * 1_000_000 // n_docs if n_docs else 0
    )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_docs": pa.array([n_docs], type=pa.int64()),
                "total_chars": pa.array([total_chars], type=pa.int64()),
                "total_tokens": pa.array([total_toks], type=pa.int64()),
                "n_sources": pa.array([len(sources)], type=pa.int64()),
                "n_langs": pa.array([len(langs)], type=pa.int64()),
                "n_unique_texts": pa.array([n_unique], type=pa.int64()),
                "dup_ppm": pa.array([dup_ppm], type=pa.int64()),
                "vocab_size": pa.array([vocab_size], type=pa.int64()),
            }
        )
    )


def packing_efficiency_report(
    ds: ray.data.Dataset, capacity: int = 1000, shard_size: int = 64
) -> ray.data.Dataset:
    """(n_docs, n_seqs, used_chars, cap_chars, util_ppm) — the bin-fill
    audit of [[pack_sequences]] under the same (capacity, shard_size):
    how much of the allocated sequence budget the greedy next-fit pack
    actually fills (util_ppm = used·10⁶ // cap). The
    pick-the-capacity dial a pretraining data team turns before
    committing a pack — utilization collapses when capacity ≈ doc
    length (every doc strands half a bin) and recovers as
    capacity ≫ median length.

    Shape: sequence counts come from the pack output's per-shard max
    seq_no (ONE bounded [[keyed_fold]] max over ≤ #shards rows — the
    pack's own keyed exchange already ran); used chars fold straight
    from the input ([[corpus_datasheet]] partials). Single audit row."""
    from .exchange import keyed_fold

    packed = pack_sequences(ds, capacity=capacity, shard_size=shard_size)
    per_shard = keyed_fold(
        packed.map_batches(
            lambda b: b.select(["shard", "seq_no"]),
            batch_format="pyarrow",
        ),
        "shard",
        [("seq_no", "max")],
    )
    n_seqs = sum(
        r["s"]
        for r in per_shard.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "s": pa.array(
                        [
                            int(
                                b["seq_no"]
                                .to_numpy(zero_copy_only=False)
                                .sum()
                            )
                            + b.num_rows
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).take_all()
    )  # Σ(max_seq_no + 1) folded per block — O(#blocks) driver rows

    def char_partial(batch: pa.Table) -> pa.Table:
        c = batch["n_chars"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n": pa.array([batch.num_rows], type=pa.int64()),
                "chars": pa.array([int(c.sum())], type=pa.int64()),
            }
        )

    n_docs = used = 0
    for r in ds.map_batches(
        char_partial, batch_format="pyarrow"
    ).take_all():
        n_docs += r["n"]
        used += r["chars"]
    cap = n_seqs * capacity
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_docs": pa.array([n_docs], type=pa.int64()),
                "n_seqs": pa.array([n_seqs], type=pa.int64()),
                "used_chars": pa.array([used], type=pa.int64()),
                "cap_chars": pa.array([cap], type=pa.int64()),
                "util_ppm": pa.array(
                    [used * 1_000_000 // cap if cap else 0],
                    type=pa.int64(),
                ),
            }
        )
    )
