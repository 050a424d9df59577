"""Lexical retrieval over a documents table: BM25 top-k scoring of a
small fixed query set against every document — the retrieval-based data
selection / decontamination primitive (find the training docs most
relevant to an eval query).

Exact-integer BM25 contract (bit-replayable in SQL):
  - Lucene-style always-positive idf: idf_fp6 = floor(1e6 * ln(
    (2N + 2) / (2*df + 1)) + 0.5). The ratio is one IEEE division of two
    exact integers and ln is platform libm in BOTH engines (same
    verified-bit-equal contract as tfidf_top_terms), so idf_fp6 is the
    same int64 everywhere. Positivity matters: every per-term
    contribution is then positive, so Python's floor division and
    DuckDB's truncating ``//`` agree.
  - Per (doc, term) contribution, k1 = k1m/1000, b = bm/1000, avgdl =
    T/N (total corpus tokens over doc count), multiplied through by
    1e6 * T to clear every denominator:
        num = idf_fp6 * tf * (k1m + 1000) * 1000 * T
        den = tf * 1e6 * T  +  k1m * (1000 - bm) * T  +  k1m * bm * dl * N
        contribution = num // den      (exact big-int rational)
    Python ints are arbitrary precision; the oracle casts through
    HUGEINT (128-bit) — num < 2^127 up to ~1e14 corpus tokens.
  - score_fp6 = sum of integer contributions; ties (score DESC,
    doc_id ASC).

Scale shape: pass A is one scan with an in-batch combiner emitting ONE
(term, df_partial, t_partial) row per query term per block -> tiny
driver fold (O(#query terms), no vocab table). Pass B is one scan that
scores per document locally and keeps only each block's per-query top-k
(<= Q*k rows leave every block) -> one final tiny groupby(query_id).
Text never shuffles; no driver-side iteration over docs.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow as pa
import ray.data

_WORD_RE = re.compile(r"[A-Za-z]+")


def _tokens(text: str) -> list[str]:
    return [w.lower() for w in _WORD_RE.findall(text)]


def bm25_topk(
    ds: ray.data.Dataset,
    queries: list[str],
    k: int = 5,
    k1_milli: int = 1200,
    b_milli: int = 750,
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """(query_id, doc_id, score_fp6, rnk) — the ``k`` highest-BM25 docs
    per query (docs sharing no query term are unranked; every ranked
    score is > 0 by the positive-idf contract above)."""
    if n_docs is None:
        n_docs = ds.count()  # metadata-only on a bare parquet read

    q_terms: list[set[str]] = [set(_tokens(q)) for q in queries]
    all_terms = sorted(set().union(*q_terms)) if q_terms else []
    term_set = set(all_terms)

    # ---- pass A: df per query term + total corpus token count T ----
    STAT_SCHEMA = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("t", pa.int64())]
    )

    def stat_partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        t = 0
        for text in batch["text"].to_pylist():
            toks = _tokens(text)
            t += len(toks)
            df.update(term_set.intersection(toks))
        rows = [{"term": w, "df": df.get(w, 0), "t": 0} for w in all_terms]
        rows.append({"term": "", "df": 0, "t": t})  # totals row
        return pa.Table.from_pylist(rows, schema=STAT_SCHEMA)

    stats = (
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "t"])
        .take_all()
    )  # O(#query terms + 1) rows on the driver
    big_t = 0
    df_map: dict[str, int] = {}
    for r in stats:
        if r["term"] == "":
            big_t = r["sum(t)"]
        else:
            df_map[r["term"]] = r["sum(df)"]

    idf_fp6 = {
        w: math.floor(
            math.log((2 * n_docs + 2) / (2 * df_map[w] + 1)) * 1e6 + 0.5
        )
        for w in all_terms
        if df_map.get(w, 0) > 0
    }

    # ---- pass B: per-doc scoring, per-block per-query top-k combiner ----
    OUT_SCHEMA = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("score_fp6", pa.int64()),
        ]
    )
    km, bm, t_tot, n_tot = k1_milli, b_milli, big_t, n_docs

    def score_block(batch: pa.Table) -> pa.Table:
        per_q: list[list[tuple[int, int]]] = [[] for _ in queries]
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = _tokens(text)
            dl = len(toks)
            tf = Counter(w for w in toks if w in term_set)
            if not tf:
                continue
            contrib = {}
            for w, f in tf.items():
                if w not in idf_fp6:
                    continue
                num = idf_fp6[w] * f * (km + 1000) * 1000 * t_tot
                den = f * 1000000 * t_tot + km * (1000 - bm) * t_tot + km * bm * dl * n_tot
                contrib[w] = num // den
            for qi, terms in enumerate(q_terms):
                s = sum(contrib.get(w, 0) for w in terms)
                if s > 0:
                    per_q[qi].append((s, doc_id))
        rows = []
        for qi, cands in enumerate(per_q):
            cands.sort(key=lambda r: (-r[0], r[1]))
            rows.extend(
                {"query_id": qi, "doc_id": d, "score_fp6": s}
                for s, d in cands[:k]
            )
        return pa.Table.from_pylist(rows, schema=OUT_SCHEMA)

    FINAL_SCHEMA = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("score_fp6", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def pick(group: pa.Table) -> pa.Table:
        rows = sorted(
            group.to_pylist(), key=lambda r: (-r["score_fp6"], r["doc_id"])
        )[:k]
        return pa.Table.from_pylist(
            [{**r, "rnk": i} for i, r in enumerate(rows, 1)],
            schema=FINAL_SCHEMA,
        )

    return (
        ds.map_batches(score_block, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(pick, batch_format="pyarrow")
    )


def hybrid_rrf(
    docs_ds: ray.data.Dataset,
    emb_ds: ray.data.Dataset,
    queries: list[str],
    k: int = 5,
    k_cand: int = 10,
    rrf_k: int = 60,
    n_docs: int | None = None,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, doc_id, rrf_fp9, rnk) — hybrid retrieval with reciprocal
    rank fusion (Cormack et al. SIGIR'09): each query's BM25 top-``k_cand``
    (lexical) and exact-cosine top-``k_cand`` (dense; query vector = the
    embedding row whose vec_id equals the query's index) are fused by
    rrf(d) = Σ_sides 1e9 // (rrf_k + rank_side(d)) — pure integer
    division, so the score is exact on both engines — and the top-``k``
    by (rrf_fp9 DESC, doc_id) win. The production retrieval shape
    (sparse+dense ensembles beat either side alone) applied to
    data-selection: surface docs that are lexically OR semantically close
    to an eval query.

    Scale shape: both sides are the existing scale-shaped operators
    (bm25_topk: two scans, per-block top-k combiners; knn_bruteforce:
    broadcast query matrix, per-block top-k). The fusion itself touches
    only ≤ 2·Q·k_cand candidate rows — ONE tiny query_id keyed groupby;
    document text and vectors never reach it."""
    from .similarity import knn_bruteforce

    lex = bm25_topk(docs_ds, queries, k=k_cand, n_docs=n_docs)
    dense = knn_bruteforce(
        emb_ds, n_queries=len(queries), k=k_cand, head_ds=head_ds
    )

    U_SCHEMA = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("side", pa.int8()),
            ("key", pa.int64()),
        ]
    )

    def tag_lex(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "query_id": batch["query_id"],
                "doc_id": batch["doc_id"],
                "side": pa.array([0] * batch.num_rows, type=pa.int8()),
                "key": batch["score_fp6"],
            },
            schema=U_SCHEMA,
        )

    def tag_dense(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "query_id": batch["query_id"],
                "doc_id": batch["vec_id"],
                "side": pa.array([1] * batch.num_rows, type=pa.int8()),
                "key": batch["cos_fp5"],
            },
            schema=U_SCHEMA,
        )

    merged = lex.map_batches(tag_lex, batch_format="pyarrow").union(
        dense.map_batches(tag_dense, batch_format="pyarrow")
    )

    OUT_SCHEMA = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("rrf_fp9", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def fuse(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()  # <= 2 * k_cand candidate rows
        score: dict[int, int] = {}
        for side in (0, 1):
            cands = sorted(
                (r for r in rows if r["side"] == side),
                key=lambda r: (-r["key"], r["doc_id"]),
            )
            for rank, r in enumerate(cands, 1):
                score[r["doc_id"]] = score.get(r["doc_id"], 0) + 10**9 // (
                    rrf_k + rank
                )
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        qid = rows[0]["query_id"]
        return pa.Table.from_pylist(
            [
                {"query_id": qid, "doc_id": d, "rrf_fp9": s, "rnk": i}
                for i, (d, s) in enumerate(top, 1)
            ],
            schema=OUT_SCHEMA,
        )

    return merged.groupby("query_id").map_groups(fuse, batch_format="pyarrow")


def inverted_index(
    ds: ray.data.Dataset, k: int = 32, max_postings: int = 100_000
) -> ray.data.Dataset:
    """(token, df, postings) — materialized posting lists for the
    corpus's top-``k`` vocabulary: df is the token's full document
    frequency and postings the comma-joined ascending doc_ids capped at
    ``max_postings`` (the shard guard: a stop-word's list at 100 TB is
    unbounded; real indexes shard it — the cap keeps the per-token
    output block bounded while df stays exact).

    Shape: pass 1 is the bounded top-k vocab fold (broadcast by closure,
    O(k)); pass 2 ships only DISTINCT (token, doc_id) int pairs for
    vocab tokens — the text never shuffles — into a k-group keyed
    groupby whose per-group sweep sorts ids and joins the capped head.

    Oracle: vocab CTE + DISTINCT pairs + string_agg(... ORDER BY doc_id)
    under a ROW_NUMBER cap."""
    from tableextraction_ray.functions.textstats import (
        ascii_tokens,
        token_freq,
    )

    vocab = frozenset(r["token"] for r in token_freq(ds, k=k).take_all())

    def pairs(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        ids: list[int] = []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for w in set(ascii_tokens(t)) & vocab:
                toks.append(w)
                ids.append(did)
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    def sweep(group: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        head = ",".join(str(int(i)) for i in ids[:max_postings])
        return pa.Table.from_pydict(
            {
                "token": pa.array([group["token"][0].as_py()]),
                "df": pa.array([len(ids)], type=pa.int64()),
                "postings": pa.array([head], type=pa.string()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .map_groups(sweep, batch_format="pyarrow")
    )
