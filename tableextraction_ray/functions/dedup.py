"""Deduplication over a documents table: exact, MinHash+LSH, n-gram Jaccard.

Scale notes (the 100 TB story):

- exact: key = md5(text) computed inside map_batches; the groupby shuffles
  only (hash, doc_id) pairs — never the text payloads.
- MinHash+LSH: shingle -> 16-perm minhash signature -> 4 banded keys per
  doc; candidate pairs come from a groupby on (band, key) — the classic
  shuffle-light near-dup join (no O(n^2) compare; only same-bucket pairs).
- n-gram Jaccard: exact verification over the LSH candidates only.

MinHash signatures use one md5 base hash per shingle plus affine integer
permutations mod 2^61-1, so the DuckDB oracle reproduces them bit-for-bit
in SQL arithmetic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

NUM_PERMS = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
SHINGLE_N = 3


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(text_md5, keep_doc_id, n_copies) — keep the minimum doc_id per exact
    content hash."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "text_md5": pa.array(
                    [_md5(t) for t in batch["text"].to_pylist()], type=pa.string()
                ),
                "doc_id": batch["doc_id"],
            }
        )

    agg = ds.map_batches(hash_batch, batch_format="pyarrow").groupby("text_md5").aggregate(
        Min("doc_id"), Count()
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "text_md5": batch["text_md5"],
                "keep_doc_id": batch["min(doc_id)"].cast(pa.int64()),
                "n_copies": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def dedup_incremental(
    new_ds: ray.data.Dataset, existing_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, text_md5) — the NEW documents whose exact content hash is
    absent from an EXISTING corpus: the snapshot-over-snapshot dedup every
    crawl ingestion runs before appending a new batch (keep a new doc iff
    no prior snapshot already has its text). Within-batch duplicates are
    exact_dedup's job; this operator is the cross-corpus anti-join.

    Scale shape: both sides hash inside map_batches and only
    (text_md5, doc_id, is_new) triples ride ONE keyed shuffle — document
    text never moves, and the existing corpus is streamed, never
    broadcast (at 100 TB the existing side is the BIG side, so the
    broadcast-small-side pattern is the wrong one here). Oracle:
    NOT EXISTS anti-join on md5(text)."""

    def tag(is_new: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {
                    "text_md5": pa.array(
                        [_md5(t) for t in batch["text"].to_pylist()],
                        type=pa.string(),
                    ),
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "is_new": pa.array(
                        np.full(len(batch), is_new, dtype=np.int8),
                        type=pa.int8(),
                    ),
                }
            )

        return fn

    tagged = new_ds.map_batches(tag(1), batch_format="pyarrow").union(
        existing_ds.map_batches(tag(0), batch_format="pyarrow")
    )

    def survivors(group: pa.Table) -> pa.Table:
        flags = group["is_new"].to_numpy(zero_copy_only=False)
        if flags.min() == 0:  # hash present in the existing corpus
            keep = np.zeros(len(group), dtype=bool)
        else:
            keep = np.ones(len(group), dtype=bool)
        return pa.Table.from_pydict(
            {
                "doc_id": group["doc_id"].filter(pa.array(keep)),
                "text_md5": group["text_md5"].filter(pa.array(keep)),
            }
        )

    return tagged.groupby("text_md5").map_groups(
        survivors, batch_format="pyarrow"
    )


def shingle_set(text: str) -> list[str]:
    """Distinct word 3-gram shingles, first-occurrence order (matches the
    oracle's list_distinct only as a set — consumers must be order-free).
    Tokenization is the shared ASCII-whitespace contract
    (textstats.ascii_tokens) so the oracle's regexp_extract_all matches."""
    from .textstats import ascii_tokens

    toks = ascii_tokens(text)
    if len(toks) < SHINGLE_N:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - SHINGLE_N + 1):
        seen.setdefault(" ".join(toks[i : i + SHINGLE_N]), None)
    return list(seen)


#: Mersenne prime modulus for the affine permutation family.
M61 = (1 << 61) - 1


def shingle_base_hash(s: str) -> int:
    """60-bit integer base hash: first 15 hex digits of md5 (fits BIGINT,
    so the DuckDB oracle can hex-parse it exactly)."""
    return int(_md5(s)[:15], 16)


def minhash_signature(shingles: list[str]) -> list[int]:
    """Standard affine-permutation minhash: ONE md5 per shingle, then
    ``min((a_p * x + b_p) mod (2^61 - 1))`` per permutation with
    a_p = 2p + 3, b_p = 7p + 1. Round 1 hashed md5(f"{p}:{s}") per
    (perm, shingle) — 16x the md5 calls, ~72 CPU-s per bench-tier pass in
    banding alone; the affine family is the textbook construction and
    reproduces bit-for-bit in SQL integer arithmetic."""
    xs = [shingle_base_hash(s) for s in shingles]
    return [
        min(((2 * p + 3) * x + 7 * p + 1) % M61 for x in xs)
        for p in range(NUM_PERMS)
    ]


def _band_rows(batch: pa.Table) -> pa.Table:
    doc_ids, bands, keys, md5s = [], [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sh = shingle_set(text)
        if not sh:
            continue
        sig = minhash_signature(sh)
        h = _md5(text)
        for b in range(NUM_BANDS):
            key = _md5(
                "|".join(str(v) for v in sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND])
            )
            doc_ids.append(doc_id)
            bands.append(b)
            keys.append(key)
            md5s.append(h)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band": pa.array(bands, type=pa.int64()),
            "key": pa.array(keys, type=pa.string()),
            "text_md5": pa.array(md5s, type=pa.string()),
        }
    )


def minhash_candidates(
    ds: ray.data.Dataset, distinct: bool = True
) -> ray.data.Dataset:
    """(doc_a, doc_b) — distinct candidate near-dup pairs from LSH banding,
    among EXACT-DISTINCT representatives: within a bucket, docs with
    identical text collapse to their minimum doc_id before pair expansion
    (identical texts share every band key, so the in-bucket minimum is the
    global one). This is the heavy-duplicate skew guard — a corpus with
    1,000 copies of one document produces 1 representative and 0 pairs per
    bucket instead of an O(n^2) blow-up (pairs AMONG exact copies are
    ``exact_dedup``'s job, not a near-dup candidate's). Oracle mirrors the
    collapse (min doc_id per distinct text)."""
    bands = ds.map_batches(_band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        reps: dict[str, int] = {}
        for doc_id, h in zip(
            group["doc_id"].to_pylist(), group["text_md5"].to_pylist()
        ):
            if h not in reps or doc_id < reps[h]:
                reps[h] = doc_id
        ids = sorted(reps.values())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
            }
        )

    pairs = bands.groupby(["band", "key"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    if not distinct:
        # A pair colliding in b bands appears b times; callers whose
        # downstream is per-pair-idempotent (ngram_jaccard's pair-key
        # groupby) can skip this whole all-to-all.
        return pairs

    # Distinct across bands: a tiny groupby on the pair key.
    deduped = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count())

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_a": batch["doc_a"], "doc_b": batch["doc_b"]}
        )

    return deduped.map_batches(project, batch_format="pyarrow")


def ngram_jaccard(
    ds: ray.data.Dataset,
    semi_join: bool | None = None,
    candidate_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard_fp6) — exact 3-gram Jaccard for every LSH
    candidate pair, fixed-point 1e6.

    Fully distributed verification join; shingle sets travel through two
    doc-key/pair-key shuffles, never through the driver:

        pairs -> 2 side rows (join_key=doc, pair)      # explode
        union(docs, side rows)
          .groupby(doc) -> attach shingles to each side
          .groupby(pair) -> intersect the two sides -> jaccard

    Two ways to avoid shingling non-candidate docs:

    - ``semi_join=False``: broadcast the candidate DOC-ID SET (ints —
      tiny at sandbox scale) and shingle only members before the doc-key
      shuffle. One driver-held set, minimal shuffle payload.
    - ``semi_join=True`` (the 10^9-candidate path): no driver set at all —
      every (doc_id, text) row rides the SAME doc-key shuffle as the side
      rows, and the text is shingled inside ``attach`` ONLY when side rows
      are present in its group. Trades the unbounded driver set for
      shipping texts through one keyed exchange; equivalence with the
      broadcast path is asserted in tests.

    ``semi_join=None`` (default) AUTO-ROUTES on the materialized candidate
    count (metadata-only probe, no extra pass): broadcast while the pair
    count is at most ``candidate_limit`` (id-set <= 2x that in 8-byte
    ints), semi-join above — the same size-guard pattern as
    ``relational.orders_by_segment``, so nobody ships the driver-set path
    into a 10^9-candidate corpus by accident.
    """
    import ray

    from . import fp

    # Materialize the candidate pipeline ONCE: it is consumed twice below
    # (the needed-id scan and the explode_sides branch), and an
    # unmaterialized Dataset re-executes per consumption — round 1 ran the
    # whole LSH banding twice. The materialized candidate set is tiny
    # ((int, int) pairs), so pinning its blocks in the object store is free
    # relative to re-running the shuffle.
    # distinct=False skips one all-to-all: duplicate (a, b) side rows from
    # multi-band collisions are harmless — score_pair emits exactly one row
    # per pair-key group either way.
    cand = minhash_candidates(ds, distinct=False).materialize()
    if semi_join is None:
        # Auto-route: count() on a materialized dataset is metadata-only.
        # distinct=False rows over-count true pairs by the band-collision
        # multiplicity (<= NUM_BANDS), which only flips the guard EARLIER —
        # the conservative direction.
        semi_join = cand.count() > candidate_limit
    needed_ref = None
    if not semi_join:
        needed_set = set()
        for batch in cand.iter_batches(batch_format="pyarrow"):
            needed_set.update(batch["doc_a"].to_pylist())
            needed_set.update(batch["doc_b"].to_pylist())
        needed_ref = ray.put(needed_set)

    SIDE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pair_a", pa.int64()),
            ("pair_b", pa.int64()),
            ("shingles", pa.list_(pa.string())),
            ("text", pa.string()),
        ]
    )

    def explode_sides(batch: pa.Table) -> pa.Table:
        ids, pa_, pb = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            ids.extend((a, b))
            pa_.extend((a, a))
            pb.extend((b, b))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pair_a": pa.array(pa_, type=pa.int64()),
                "pair_b": pa.array(pb, type=pa.int64()),
                "shingles": pa.array([None] * len(ids), type=pa.list_(pa.string())),
                "text": pa.array([""] * len(ids), type=pa.string()),
            },
            schema=SIDE_SCHEMA,
        )

    def doc_shingles(batch: pa.Table) -> pa.Table:
        """Broadcast path: shingle candidate members up front."""
        needed = ray.get(needed_ref)
        ids, sh = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if doc_id in needed:
                ids.append(doc_id)
                sh.append(shingle_set(text))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pair_a": pa.array([-1] * len(ids), type=pa.int64()),
                "pair_b": pa.array([-1] * len(ids), type=pa.int64()),
                "shingles": pa.array(sh, type=pa.list_(pa.string())),
                "text": pa.array([""] * len(ids), type=pa.string()),
            },
            schema=SIDE_SCHEMA,
        )

    def doc_texts(batch: pa.Table) -> pa.Table:
        """Semi-join path: every doc rides the shuffle, text unshingled."""
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pair_a": pa.array([-1] * n, type=pa.int64()),
                "pair_b": pa.array([-1] * n, type=pa.int64()),
                "shingles": pa.array([None] * n, type=pa.list_(pa.string())),
                "text": batch["text"],
            },
            schema=SIDE_SCHEMA,
        )

    def attach(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        sides = [r for r in rows if r["pair_a"] != -1]
        if not sides:
            return pa.Table.from_pylist([], schema=SIDE_SCHEMA)
        doc = next((r for r in rows if r["pair_a"] == -1), None)
        if doc is None:
            sh = []
        elif doc["shingles"] is not None:
            sh = doc["shingles"]
        else:
            sh = shingle_set(doc["text"])  # semi-join: shingle on demand
        out = [{**r, "shingles": sh, "text": ""} for r in sides]
        return pa.Table.from_pylist(out, schema=SIDE_SCHEMA)

    def score_pair(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        a = rows[0]["pair_a"]
        b = rows[0]["pair_b"]
        sides = [set(r["shingles"]) for r in rows]
        sa = next((s for r, s in zip(rows, sides) if r["doc_id"] == a), set())
        sb = next((s for r, s in zip(rows, sides) if r["doc_id"] == b), set())
        inter = len(sa & sb)
        uni = len(sa | sb)
        return pa.Table.from_pylist(
            [
                {
                    "doc_a": a,
                    "doc_b": b,
                    "jaccard_fp6": fp(inter * 1000000.0 / uni, 0) if uni else 0,
                }
            ],
            schema=pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("jaccard_fp6", pa.int64()),
                ]
            ),
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    doc_fn = doc_texts if semi_join else doc_shingles
    docs_side = ds.map_batches(doc_fn, batch_format="pyarrow")
    attached = (
        docs_side.union(sides)
        .groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
    )
    return attached.groupby(["pair_a", "pair_b"]).map_groups(
        score_pair, batch_format="pyarrow"
    )


def exact_dup_edges(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_a, doc_b) — one edge from each exact-copy document to its
    minimum-doc_id representative (a star per duplicated text, enough to
    connect the component). Same md5 groupby shape as exact_dedup; only
    (hash, doc_id) pairs shuffle."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "text_md5": pa.array(
                    [_md5(t) for t in batch["text"].to_pylist()], type=pa.string()
                ),
                "doc_id": batch["doc_id"].cast(pa.int64()),
            }
        )

    def star(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        rep = ids[0]
        others = ids[1:]
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array([rep] * len(others), type=pa.int64()),
                "doc_b": pa.array(others, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .map_groups(star, batch_format="pyarrow")
    )


def dedup_clusters(
    ds: ray.data.Dataset,
    edges: ray.data.Dataset | None = None,
    max_iters: int = 16,
    driver_edge_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """(doc_id, cluster_rep) for EVERY document: connected components over
    the near-dup candidate graph — the "keep one per fuzzy-dup cluster"
    primitive a training-data pipeline runs after LSH. cluster_rep is the
    minimum doc_id reachable through candidate pairs; docs touching no edge
    are their own rep.

    Two paths, size-guarded on the EDGE COUNT (the edge list is (int, int)
    pairs — a vanishing fraction of the corpus bytes even when the corpus
    itself is 100 TB):

    - |edges| <= driver_edge_limit (default 5M ~ 80 MB): union-find on the
      collected edge list, then ONE map_batches pass over the corpus
      assigning each doc its broadcast representative. No iteration, no
      extra shuffle.
    - larger: distributed min-label propagation over the edge SUBGRAPH
      (label(v) <- min over neighbors of label(u)) followed by a
      pointer-doubling step (label <- label(label)) each round — three
      keyed shuffles per round, rounds = O(log component diameter),
      convergence = label-sum fixpoint since labels only decrease. NO
      driver state anywhere on this path: initial labels come from a
      distributed distinct over the edge endpoints, and the singleton
      bypass is a keyed anti-join (docs ∪ final labels, grouped by
      doc_id) instead of a broadcast node set. Labels materialize per
      round (16 bytes/node).

    Oracle: recursive CTE transitive closure (min reachable doc_id).
    """
    import ray as _ray

    if edges is None:
        # Near-dup candidates PLUS exact-copy edges: minhash_candidates
        # collapses identical texts to one representative (skew guard), so
        # without these edges an exact copy would sit in its own cluster.
        # distinct=False: connected components are idempotent to duplicate
        # edges (union-find re-union and min-label re-propagation are
        # no-ops), so the pair-distinct all-to-all inside
        # minhash_candidates is pure waste here — skip it. The edge-count
        # guard below then counts band-duplicated pairs, which only makes
        # the driver-memory guard MORE conservative.
        edges = minhash_candidates(ds, distinct=False).union(exact_dup_edges(ds))
    edges = edges.materialize()
    # Materialized count is metadata-only — the guard probe reads no rows,
    # and nothing is collected before we know which path we're on.
    n_edges = edges.count()

    if n_edges == 0:
        def identity(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].cast(pa.int64())
            return pa.Table.from_pydict({"doc_id": ids, "cluster_rep": ids})

        return ds.map_batches(identity, batch_format="pyarrow")

    if n_edges <= driver_edge_limit:
        pairs: list[tuple[int, int]] = []
        for b in edges.iter_batches(batch_format="pyarrow"):
            pairs.extend(zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist()))
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b_ in pairs:
            ra, rb = find(a), find(b_)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rep = {x: find(x) for x in parent}
        rep_ref = _ray.put(rep)

        def assign(batch: pa.Table) -> pa.Table:
            r = _ray.get(rep_ref)
            ids = batch["doc_id"].to_pylist()
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "cluster_rep": pa.array(
                        [r.get(d, d) for d in ids], type=pa.int64()
                    ),
                }
            )

        return ds.map_batches(assign, batch_format="pyarrow")

    # --- distributed scale path: min-label propagation on the subgraph ---
    # Initial labels = the DISTINCT edge endpoints, computed as a keyed
    # groupby over the edge rows (int64 pairs through the shuffle) — the
    # driver never holds the node set.
    STEP_SCHEMA = pa.schema(
        [("key", pa.int64()), ("peer", pa.int64()), ("label", pa.int64())]
    )

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.Table.from_pydict({"doc_id": batch["doc_a"].cast(pa.int64())}),
                pa.Table.from_pydict({"doc_id": batch["doc_b"].cast(pa.int64())}),
            ]
        )

    def self_label(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        return pa.Table.from_pydict({"doc_id": ids, "label": ids})

    edge_nodes_ds = (
        edges.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count())
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        return pa.Table.from_pydict(
            {
                "key": pa.array(a + b, type=pa.int64()),
                "peer": pa.array(b + a, type=pa.int64()),
                "label": pa.array([-1] * (2 * len(a)), type=pa.int64()),
            },
            schema=STEP_SCHEMA,
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": batch["doc_id"],
                "peer": pa.array([-1] * len(batch), type=pa.int64()),
                "label": batch["label"],
            },
            schema=STEP_SCHEMA,
        )

    def propose(group: pa.Table) -> pa.Table:
        # Vectorized: a heavy-duplicate node can carry millions of incident
        # edges in one group — no per-row Python here.
        import numpy as np

        peers = group["peer"].to_numpy(zero_copy_only=False)
        labels_np = group["label"].to_numpy(zero_copy_only=False)
        is_label_row = peers == -1
        label = int(labels_np[is_label_row].min())
        nodes = np.concatenate(
            [group["key"].to_numpy(zero_copy_only=False)[:1], peers[~is_label_row]]
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(nodes, type=pa.int64()),
                "label": pa.array(
                    np.full(len(nodes), label, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "label": batch["min(label)"].cast(pa.int64()),
            }
        )

    # Pointer-jumping step: label <- label(label). Label values are always
    # node ids within the subgraph (min over some reachable set), so the
    # composed label stays a reachable node and only decreases. One keyed
    # shuffle: each node queries the group of its CURRENT label (kind=1)
    # where that label's own row answers (kind=0).
    JUMP_SCHEMA = pa.schema(
        [("key", pa.int64()), ("kind", pa.int8()), ("val", pa.int64())]
    )

    def jump_queries(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "key": batch["label"].cast(pa.int64()),
                "kind": pa.array([1] * n, type=pa.int8()),
                "val": batch["doc_id"].cast(pa.int64()),
            },
            schema=JUMP_SCHEMA,
        )

    def jump_answers(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "key": batch["doc_id"].cast(pa.int64()),
                "kind": pa.array([0] * n, type=pa.int8()),
                "val": batch["label"].cast(pa.int64()),
            },
            schema=JUMP_SCHEMA,
        )

    def jump_resolve(group: pa.Table) -> pa.Table:
        import numpy as np

        kinds = group["kind"].to_numpy(zero_copy_only=False)
        vals = group["val"].to_numpy(zero_copy_only=False)
        docs_q = vals[kinds == 1]
        if len(docs_q) == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                }
            )
        ans = vals[kinds == 0]
        # every label value is a node with its own label row; min() guards
        # the (impossible) multi-answer case conservatively.
        lbl = int(ans.min()) if len(ans) else int(group["key"][0].as_py())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(docs_q, type=pa.int64()),
                "label": pa.array(
                    np.full(len(docs_q), lbl, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    labels = edge_nodes_ds.map_batches(
        self_label, batch_format="pyarrow"
    ).materialize()
    prev_sum = labels.sum("label")
    sym_edges = edges.map_batches(edge_rows, batch_format="pyarrow")
    converged = False
    for _ in range(max_iters):
        # narrow merge-repartitions before each keyed exchange: the loop's
        # rows are 17-byte ints, so sort width (O(blocks^2) transfers)
        # costs more than the data — same finding as curate.py:373.
        proposed = (
            labels.map_batches(label_rows, batch_format="pyarrow")
            .union(sym_edges)
            .repartition(16)
            .groupby("key")
            .map_groups(propose, batch_format="pyarrow")
        )
        labels = (
            proposed.repartition(16)
            .groupby("doc_id")
            .aggregate(Min("label"))
            .map_batches(finish, batch_format="pyarrow")
            .materialize()  # consumed twice by the jump's two sides
        )
        # pointer-doubling: compose labels with themselves so the reach
        # roughly doubles per round — O(log diameter) rounds instead of
        # O(diameter) under the same max_iters fail-loud guard.
        labels = (
            labels.map_batches(jump_queries, batch_format="pyarrow")
            .union(labels.map_batches(jump_answers, batch_format="pyarrow"))
            .repartition(16)
            .groupby("key")
            .map_groups(jump_resolve, batch_format="pyarrow")
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Fail loudly: returning partially-propagated labels would silently
        # violate the keep-one-per-cluster contract (and diverge from the
        # transitive-closure oracle) on a component whose diameter exceeds
        # max_iters.
        raise RuntimeError(
            f"dedup_clusters: min-label propagation did not converge in "
            f"{max_iters} rounds (component diameter exceeds max_iters); "
            f"raise max_iters"
        )

    # Singleton bypass as ONE keyed anti-join: union the corpus doc_ids
    # (tagged label=-1) with the converged labels and resolve per doc_id —
    # docs with a label row take it, docs without become their own rep.
    # Only (int64, int64) rows ride the shuffle; no broadcast set.
    RESOLVE_SCHEMA = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        return pa.Table.from_pydict(
            {"doc_id": ids, "label": pa.array([-1] * len(ids), type=pa.int64())},
            schema=RESOLVE_SCHEMA,
        )

    def resolve(group: pa.Table) -> pa.Table:
        import numpy as np

        doc_id = group["doc_id"][0].as_py()
        lbls = group["label"].to_numpy(zero_copy_only=False)
        if not (lbls == -1).any():
            # Label row for a doc_id absent from the corpus (shouldn't
            # happen: endpoints come from corpus-derived edges) — drop it
            # rather than invent a document.
            return pa.Table.from_pylist(
                [], schema=pa.schema([("doc_id", pa.int64()), ("cluster_rep", pa.int64())])
            )
        pos = lbls[lbls >= 0]
        rep = int(pos.min()) if len(pos) else doc_id
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([doc_id], type=pa.int64()),
                "cluster_rep": pa.array([rep], type=pa.int64()),
            }
        )

    tagged_docs = ds.map_batches(tag_docs, batch_format="pyarrow")
    label_side = labels.map_batches(
        lambda b: pa.Table.from_pydict(
            {"doc_id": b["doc_id"], "label": b["label"]}, schema=RESOLVE_SCHEMA
        ),
        batch_format="pyarrow",
    )
    return (
        tagged_docs.union(label_side)
        .groupby("doc_id")
        .map_groups(resolve, batch_format="pyarrow")
    )


def simhash_near_dup(
    ds: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) — every pair of distinct-fingerprint
    representatives whose 64-bit SimHash fingerprints differ in at most
    ``max_hamming`` bits, with the EXACT Hamming distance attached.

    This is the Manku-Jarvelin-Sarlos WWW'07 near-duplicate detector
    (64-bit simhash, k=3) expressed Ray-Data-first, and unlike MinHash
    LSH it is EXACT: the 64 bits split into ``max_hamming + 1`` disjoint
    bands, and by pigeonhole any pair within the Hamming ball agrees on
    at least one whole band — so a keyed groupby on (band, band_bits) is
    a lossless candidate generator and the in-bucket verify emits
    precisely the Hamming-ball pair set. Zero recall loss, hash-checkable
    against a DuckDB bit_count(xor(...)) oracle.

    Scale shape (100 TB story):
    - identical fingerprints collapse FIRST (min doc_id per simhash via
      one keyed groupby on the 8-byte fingerprint) — the same
      heavy-duplicate skew guard as minhash_candidates' exact-text
      collapse; pairs among identical-fingerprint docs are the
      fingerprint groups' own output (dedup-exact star), not pair rows.
    - band rows are (int64 key, int64 doc_id, int64 fingerprint) — the
      text never rides any shuffle.
    - a pair colliding in several bands is emitted only by its FIRST
      equal band, decided locally from the two fingerprints in hand —
      no distinct-pairs all-to-all afterwards.
    """
    import numpy as np

    from .textstats import simhash64

    n_bands = max_hamming + 1
    if 64 % n_bands:
        raise ValueError("max_hamming + 1 must divide 64 (e.g. 3, 7, 15)")
    width = 64 // n_bands
    mask = (1 << width) - 1

    sh = simhash64(ds)

    # -- collapse identical fingerprints to their min-doc_id representative
    reps = sh.groupby("simhash").aggregate(Min("doc_id", alias_name="doc_id"))

    def band_rows(batch: pa.Table) -> pa.Table:
        hexes = batch["simhash"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = np.array([int(h, 16) for h in hexes], dtype=np.uint64)
        n = len(fp)
        keys, out_ids, out_fp = [], [], []
        for j in range(n_bands):
            val = (fp >> np.uint64(j * width)) & np.uint64(mask)
            # key encodes (band j, band value) in one int64
            keys.append(val.astype(np.int64) | np.int64(j << width))
            out_ids.append(ids)
            out_fp.append(fp.view(np.int64))
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(np.concatenate(keys) if n else [], type=pa.int64()),
                "doc_id": pa.array(np.concatenate(out_ids) if n else [], type=pa.int64()),
                "fp": pa.array(np.concatenate(out_fp) if n else [], type=pa.int64()),
            }
        )

    PAIR_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )

    def verify(group: pa.Table) -> pa.Table:
        m = len(group)
        if m < 2:
            return pa.Table.from_pylist([], schema=PAIR_SCHEMA)
        band_j = int(group["bkey"][0].as_py()) >> width
        order = np.argsort(group["doc_id"].to_numpy(zero_copy_only=False))
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
        fp = group["fp"].to_numpy(zero_copy_only=False)[order].view(np.uint64)
        x = fp[:, None] ^ fp[None, :]
        ham = np.unpackbits(x.view(np.uint8).reshape(m, m, 8), axis=2).sum(
            axis=2, dtype=np.int64
        )
        iu, ju = np.triu_indices(m, 1)
        ok = ham[iu, ju] <= max_hamming
        iu, ju = iu[ok], ju[ok]
        if not len(iu):
            return pa.Table.from_pylist([], schema=PAIR_SCHEMA)
        # first-equal-band ownership: emit only if no EARLIER band also
        # matches for this pair (locally decidable from the fingerprints)
        own = np.ones(len(iu), dtype=bool)
        for j in range(band_j):
            bv = (fp >> np.uint64(j * width)) & np.uint64(mask)
            own &= bv[iu] != bv[ju]
        iu, ju = iu[own], ju[own]
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(ids[iu], type=pa.int64()),
                "doc_b": pa.array(ids[ju], type=pa.int64()),
                "hamming": pa.array(ham[iu, ju], type=pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )

    return (
        reps.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(verify, batch_format="pyarrow")
    )


def decontaminate(
    ds: ray.data.Dataset,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "split",
) -> ray.data.Dataset:
    """(doc_id, n_shared_shingles) — TRAIN-split documents that share at
    least one distinct word-3-gram shingle with ANY TEST-split document,
    with the count of distinct shared shingles: the benchmark-
    decontamination scan a training-data pipeline runs before shipping a
    corpus (n-gram-overlap contamination, as popularized by the GPT-3
    appendix-C / Dolma decontamination recipes). Splits are
    textstats.split_assign's content-hash buckets recomputed inline
    (same salt/percent contract); val docs are neither side.

    Scale shape: docs explode to (shingle_hash, doc_id, is_test) rows —
    the 60-bit md5-based shingle_base_hash, so the text itself never
    rides the shuffle — then ONE keyed groupby per shingle emits one row
    per train doc in any bucket that also contains a test doc (linear in
    bucket size, never quadratic: membership, not pairs), and a second
    (int-only) groupby counts distinct shared shingles per train doc.
    Stopword-heavy shingles shared by millions of docs cost O(bucket),
    not O(bucket^2). The DuckDB oracle joins on the SAME 60-bit hash
    expression, so output equality is by construction, collisions
    included.
    """
    import numpy as np

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        out_t: list[int] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            b = int(_md5(f"{salt}:{d}")[:8], 16) % 100
            if test_pct <= b < test_pct + val_pct:
                continue  # val: neither side of the contamination check
            is_test = 1 if b < test_pct else 0
            for s in shingle_set(t):
                out_h.append(shingle_base_hash(s))
                out_d.append(d)
                out_t.append(is_test)
        return pa.Table.from_pydict(
            {
                "sh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "is_test": pa.array(out_t, type=pa.int8()),
            }
        )

    HIT_SCHEMA = pa.schema([("doc_id", pa.int64())])

    def hits(group: pa.Table) -> pa.Table:
        is_t = group["is_test"].to_numpy(zero_copy_only=False)
        if not is_t.any() or is_t.all():
            return pa.Table.from_pylist([], schema=HIT_SCHEMA)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids[is_t == 0], type=pa.int64())},
            schema=HIT_SCHEMA,
        )

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("sh")
        .map_groups(hits, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_shared_shingles": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def dedup_spans(ds: ray.data.Dataset, chunk_n: int = 4) -> ray.data.Dataset:
    """(doc_id, n_chunks, n_dropped, clean_text) — C4-style span-level
    deduplication (Raffel et al. 2020 used three-sentence spans: "we
    removed all but one of any three-sentence span occurring more than
    once"): the corpus is cut into NON-OVERLAPPING ``chunk_n``-token
    spans, and every occurrence of a repeated span is dropped EXCEPT the
    globally-first one (lowest (doc_id, chunk_idx) — deterministic
    ownership). ``clean_text`` is the surviving spans in original order
    plus the trailing ``len % chunk_n`` remainder tokens (never part of a
    full span, always kept).

    Scale shape: spans explode to int-only (span_hash, doc_id, idx) rows
    — the shared 60-bit md5 hash, text never rides the wide shuffle. ONE
    keyed groupby per span hash emits (doc_id, idx) drop-marks for every
    occurrence but the minimum; marks ride a tagged union with the
    (doc_id, text) rows into a doc_id groupby that re-chunks the text
    locally (deterministic re-tokenization) and drops the marked spans.
    Two keyed shuffles, no join operator, no driver state; the oracle
    hashes with the same 60-bit expression, so equality is by
    construction, collisions included."""
    import numpy as np

    from .textstats import ascii_tokens

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        out_i: list[int] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = ascii_tokens(t)
            for i in range(len(toks) // chunk_n):
                out_h.append(
                    shingle_base_hash(" ".join(toks[i * chunk_n : (i + 1) * chunk_n]))
                )
                out_d.append(d)
                out_i.append(i)
        return pa.Table.from_pydict(
            {
                "sh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "idx": pa.array(out_i, type=pa.int64()),
            }
        )

    # Tagged-union schema: text rows carry idx = -1; drop-marks carry
    # text = NULL.
    MERGE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("idx", pa.int64()), ("text", pa.string())]
    )

    def drop_marks(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.Table.from_pylist([], schema=MERGE_SCHEMA)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        i = group["idx"].to_numpy(zero_copy_only=False)
        keep = np.lexsort((i, d))[0]  # globally-first occurrence survives
        mask = np.ones(len(d), dtype=bool)
        mask[keep] = False
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d[mask], type=pa.int64()),
                "idx": pa.array(i[mask], type=pa.int64()),
                "text": pa.array([None] * int(mask.sum()), type=pa.string()),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "idx": pa.array([-1] * batch.num_rows, type=pa.int64()),
                "text": batch["text"],
            },
            schema=MERGE_SCHEMA,
        )

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_dropped", pa.int64()),
            ("clean_text", pa.string()),
        ]
    )

    def rebuild(group: pa.Table) -> pa.Table:
        doc_id = group["doc_id"][0].as_py()
        text = None
        dropped: set[int] = set()
        for idx, t in zip(group["idx"].to_pylist(), group["text"].to_pylist()):
            if idx == -1:
                text = t
            else:
                dropped.add(idx)
        toks = ascii_tokens(text)
        nfull = len(toks) // chunk_n
        pieces = [
            " ".join(toks[i * chunk_n : (i + 1) * chunk_n])
            for i in range(nfull)
            if i not in dropped
        ]
        rem = toks[nfull * chunk_n :]
        if rem:
            pieces.append(" ".join(rem))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([doc_id], type=pa.int64()),
                "n_chunks": pa.array([nfull], type=pa.int64()),
                "n_dropped": pa.array([len(dropped)], type=pa.int64()),
                "clean_text": pa.array([" ".join(pieces)], type=pa.string()),
            },
            schema=OUT_SCHEMA,
        )

    marks = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("sh")
        .map_groups(drop_marks, batch_format="pyarrow")
    )
    return (
        ds.map_batches(tag_docs, batch_format="pyarrow")
        .union(marks)
        .groupby("doc_id")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def winnow_fingerprints(
    ds: ray.data.Dataset, k: int = 5, w: int = 4
) -> ray.data.Dataset:
    """(doc_id, pos, fph) — winnowing document fingerprints (Schleimer,
    Wilkerson & Aiken 2003, the MOSS algorithm): hash every word ``k``-gram,
    slide a window of ``w`` consecutive hashes, and in each window select
    the MINIMUM (ties -> the RIGHTMOST minimum), deduplicating repeated
    selections. Guarantees every match of at least w+k-1 tokens between
    two documents shares a fingerprint — the partial-copy detection
    primitive that whole-doc md5 (exact copies) and minhash (global
    resemblance) both miss.

    Scale shape: pure per-document map — one 60-bit md5 per k-gram, a
    vectorized sliding-window argmin, no shuffle at all; downstream
    overlap joins group on fph exactly like the decontaminate shingle
    join. The selection rule is deterministic integer arithmetic, so the
    SQL oracle (window MIN + rightmost-position tie-break) replays it
    row-for-row."""
    from .textstats import ascii_tokens

    def fingerprints(batch: pa.Table) -> pa.Table:
        out_d: list[int] = []
        out_p: list[int] = []
        out_h: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(text)
            n = len(toks) - k + 1
            if n <= 0:
                continue
            hashes = np.asarray(
                [shingle_base_hash(" ".join(toks[i : i + k])) for i in range(n)],
                dtype=np.int64,
            )
            if n <= w:
                # fewer grams than one window: select the rightmost min
                m = hashes.min()
                pos = int(np.nonzero(hashes == m)[0][-1])
                picked = {(pos, int(m))}
            else:
                windows = np.lib.stride_tricks.sliding_window_view(hashes, w)
                mins = windows.min(axis=1)
                # rightmost argmin: argmax over reversed equality mask
                rev = windows[:, ::-1] == mins[:, None]
                right_off = w - 1 - rev.argmax(axis=1)
                pos = np.arange(len(mins)) + right_off
                picked = set(zip(pos.tolist(), mins.tolist()))
            for p, h in sorted(picked):
                out_d.append(doc_id)
                out_p.append(p)
                out_h.append(h)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "pos": pa.array(out_p, type=pa.int64()),
                "fph": pa.array(out_h, type=pa.int64()),
            }
        )

    return ds.map_batches(fingerprints, batch_format="pyarrow")


def winnow_overlap(
    ds: ray.data.Dataset,
    min_shared: int = 2,
    max_bucket: int = 64,
    k: int = 5,
    w: int = 4,
) -> ray.data.Dataset:
    """(doc_a, doc_b, n_shared) — the MOSS comparison step: document pairs
    sharing at least ``min_shared`` winnowing fingerprints (doc_a <
    doc_b). Fingerprints shared by more than ``max_bucket`` documents are
    boilerplate and are dropped before pairing — MOSS's over-common-
    fingerprint rule, and the same skew guard the LSH buckets use: a
    boilerplate hash would otherwise explode one group to O(n^2) pairs.

    Scale shape: only (doc_id, fph) int pairs ride the ONE fph-keyed
    shuffle; in-bucket pairing works on the DISTINCT doc set (a doc's
    repeated picks of one fingerprint collapse), and the pair-count
    groupby moves (doc_a, doc_b, 1) rows bounded by bucket_size^2 per
    surviving fingerprint."""
    from ray.data.aggregate import Sum

    fps = winnow_fingerprints(ds, k=k, w=w)

    def project(batch: pa.Table) -> pa.Table:
        # drop pos; local (doc_id, fph) dedupe shrinks the shuffle
        seen = sorted(set(zip(batch["doc_id"].to_pylist(), batch["fph"].to_pylist())))
        return pa.Table.from_pydict(
            {
                "fph": pa.array([f for _, f in seen], type=pa.int64()),
                "doc_id": pa.array([d for d, _ in seen], type=pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        docs = sorted(set(group["doc_id"].to_pylist()))
        out_a, out_b = [], []
        if 2 <= len(docs) <= max_bucket:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    out_a.append(docs[i])
                    out_b.append(docs[j])
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "n": pa.array([1] * len(out_a), type=pa.int64()),
            }
        )

    counted = (
        fps.map_batches(project, batch_format="pyarrow")
        .groupby("fph")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch["sum(n)"].cast(pa.int64())
        keep = pc.greater_equal(n, pa.scalar(min_shared, type=pa.int64()))
        return pa.Table.from_pydict(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "n_shared": n,
            }
        ).filter(keep)

    return counted.map_batches(finish, batch_format="pyarrow")


def boilerplate_lines(
    ds: ray.data.Dataset, max_docs: int = 1
) -> ray.data.Dataset:
    """(doc_id, n_lines, n_dropped, clean_text) — cross-document repeated-
    LINE removal (the CCNet / onion paragraph-dedup convention, and the
    nav-menu/footer "boilerplate" pass every web-crawl pipeline runs):
    any line whose content appears in MORE THAN ``max_docs`` distinct
    documents is dropped from EVERY document — all copies, no keep-first
    (contrast dedup_spans, which keeps the globally-first occurrence of a
    repeated fixed-width token span). Whitespace-only lines never qualify
    (they are structure, not content) and always survive; ``clean_text``
    is the surviving lines joined by newline in original order.

    Scale shape (same discipline as dedup_spans): lines explode to
    int-only (line_hash, doc_id, idx) rows — the shared 60-bit md5 hash,
    text never rides the wide shuffle. ONE keyed groupby per line hash
    counts distinct documents and emits (doc_id, idx) drop-marks for ALL
    occurrences of boilerplate lines; marks ride a tagged union with the
    (doc_id, text) rows into a doc_id groupby that re-splits the text
    locally and drops marked indices. Two keyed shuffles, no driver
    state; the oracle replays the same hash, so equality holds by
    construction, collisions included."""
    import re

    import numpy as np

    content_re = re.compile(r"[^ \t\r\v\f]")

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        out_i: list[int] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for i, line in enumerate(t.split("\n")):
                if content_re.search(line):
                    out_h.append(shingle_base_hash(line))
                    out_d.append(d)
                    out_i.append(i)
        return pa.Table.from_pydict(
            {
                "lh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "idx": pa.array(out_i, type=pa.int64()),
            }
        )

    MERGE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("idx", pa.int64()), ("text", pa.string())]
    )

    def drop_marks(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        if len(np.unique(d)) <= max_docs:
            return pa.Table.from_pylist([], schema=MERGE_SCHEMA)
        return pa.Table.from_pydict(
            {
                "doc_id": group["doc_id"],
                "idx": group["idx"],
                "text": pa.array([None] * len(d), type=pa.string()),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "idx": pa.array([-1] * batch.num_rows, type=pa.int64()),
                "text": batch["text"],
            },
            schema=MERGE_SCHEMA,
        )

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_lines", pa.int64()),
            ("n_dropped", pa.int64()),
            ("clean_text", pa.string()),
        ]
    )

    def rebuild(group: pa.Table) -> pa.Table:
        doc_id = group["doc_id"][0].as_py()
        text = None
        dropped: set[int] = set()
        for idx, t in zip(group["idx"].to_pylist(), group["text"].to_pylist()):
            if idx == -1:
                text = t
            else:
                dropped.add(idx)
        lines = text.split("\n")
        kept = [ln for i, ln in enumerate(lines) if i not in dropped]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([doc_id], type=pa.int64()),
                "n_lines": pa.array([len(lines)], type=pa.int64()),
                "n_dropped": pa.array([len(dropped)], type=pa.int64()),
                "clean_text": pa.array(["\n".join(kept)], type=pa.string()),
            },
            schema=OUT_SCHEMA,
        )

    marks = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("lh")
        .map_groups(drop_marks, batch_format="pyarrow")
    )
    return (
        ds.map_batches(tag_docs, batch_format="pyarrow")
        .union(marks)
        .groupby("doc_id")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def minhash_jaccard_est(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_a, doc_b, n_match, n_perms) — the minhash Jaccard ESTIMATE for
    every LSH candidate pair: the fraction of the 16 permutations whose
    signature slots agree is an unbiased estimator of the pair's true
    shingle-Jaccard (Broder 1997). Completes the minhash trio —
    minhash_candidates (recall), THIS (cheap screen: n_match/n_perms needs
    only the 16-int signatures, never the shingle sets), ngram_jaccard
    (exact verify). Kept pure-integer (no float division) so it hashes
    green.

    Scale shape: ONE signature pass; band rows CARRY the 16-int signature
    (128 bytes x 4 bands), so agreement counts are computed inside the
    same bucket groupby that generates the candidates (exact-copy
    collapse included) and the only other shuffle is the tiny
    pair-distinct aggregate. Two keyed shuffles total, no join operator,
    no driver state. Candidates are identical to minhash_candidates'
    (same band keys from the same signatures)."""
    from ray.data.aggregate import Max

    def band_sig_rows(batch: pa.Table) -> pa.Table:
        doc_ids, bands_, keys, md5s, mhs = [], [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = shingle_set(text)
            if not sh:
                continue
            sig = minhash_signature(sh)
            h = _md5(text)
            for b in range(NUM_BANDS):
                keys.append(
                    _md5("|".join(
                        str(v)
                        for v in sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                    ))
                )
                doc_ids.append(doc_id)
                bands_.append(b)
                md5s.append(h)
                mhs.append(sig)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band": pa.array(bands_, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "text_md5": pa.array(md5s, type=pa.string()),
                "mh": pa.array(mhs, type=pa.list_(pa.int64())),
            }
        )

    def bucket_scored_pairs(group: pa.Table) -> pa.Table:
        # exact-copy collapse to the min doc_id per distinct text, keeping
        # that representative's signature (identical texts share it)
        reps: dict[str, int] = {}
        sig_of: dict[int, list] = {}
        for doc_id, h, mh in zip(
            group["doc_id"].to_pylist(),
            group["text_md5"].to_pylist(),
            group["mh"].to_pylist(),
        ):
            if h not in reps or doc_id < reps[h]:
                reps[h] = doc_id
                sig_of[doc_id] = mh
        ids = sorted(reps.values())
        a, b, m = [], [], []
        for i in range(len(ids)):
            si = sig_of[ids[i]]
            for j in range(i + 1, len(ids)):
                sj = sig_of[ids[j]]
                a.append(ids[i])
                b.append(ids[j])
                m.append(sum(1 for x, y in zip(si, sj) if x == y))
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "nm": pa.array(m, type=pa.int64()),
            }
        )

    scored = (
        ds.map_batches(band_sig_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_scored_pairs, batch_format="pyarrow")
        # a pair colliding in b bands repeats with the SAME count: Max is
        # the idempotent distinct
        .groupby(["doc_a", "doc_b"])
        .aggregate(Max("nm"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "n_match": batch["max(nm)"].cast(pa.int64()),
                "n_perms": pa.array([NUM_PERMS] * n, type=pa.int64()),
            }
        )

    return scored.map_batches(rename, batch_format="pyarrow")


def dedup_incremental_fuzzy(
    new_ds: ray.data.Dataset, existing_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, text_md5) — the NEW documents that are NOT near-duplicate
    candidates of any EXISTING document: the fuzzy sibling of
    dedup_incremental (crawl pipelines run both — exact md5 anti-join,
    then this LSH screen for re-formatted/boilerplate-shifted copies). A
    new doc is dropped iff it shares at least one minhash band bucket
    with an existing doc; new-vs-new near-dups are minhash_candidates'
    job, and docs too short to shingle always survive.

    Scale shape: both sides band with the shared signature machinery and
    only (band, key, doc_id, is_new) rows ride the FIRST keyed shuffle;
    buckets emit (new_doc_id) drop-marks only for cross-side collisions,
    a tiny doc_id groupby distincts the marks, and survivors come from a
    tagged union with the new docs' (doc_id, md5) rows — three keyed
    shuffles, the existing corpus streams (never broadcast), no driver
    state. Oracle: NOT EXISTS over the full SQL band replay."""

    def band_side(is_new: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = _band_rows(batch)
            return t.append_column(
                "is_new",
                pa.array(
                    np.full(t.num_rows, is_new, dtype=np.int8), type=pa.int8()
                ),
            )

        return fn

    MERGE_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("text_md5", pa.string())]
    )

    def cross_marks(group: pa.Table) -> pa.Table:
        flags = group["is_new"].to_numpy(zero_copy_only=False)
        if flags.min() == 1 or flags.max() == 0:  # one-sided bucket
            return pa.Table.from_pylist([], schema=MERGE_SCHEMA)
        new_ids = group["doc_id"].to_numpy(zero_copy_only=False)[flags == 1]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.unique(new_ids), type=pa.int64()),
                "text_md5": pa.array(
                    [None] * len(np.unique(new_ids)), type=pa.string()
                ),
            },
            schema=MERGE_SCHEMA,
        )

    marks = (
        new_ds.map_batches(band_side(1), batch_format="pyarrow")
        .union(existing_ds.map_batches(band_side(0), batch_format="pyarrow"))
        .groupby(["band", "key"])
        .map_groups(cross_marks, batch_format="pyarrow")
    )

    def tag_new(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "text_md5": pa.array(
                    [_md5(t) for t in batch["text"].to_pylist()],
                    type=pa.string(),
                ),
            },
            schema=MERGE_SCHEMA,
        )

    def survivors(group: pa.Table) -> pa.Table:
        md5s = [h for h in group["text_md5"].to_pylist() if h is not None]
        flagged = group.num_rows > len(md5s)
        if flagged or not md5s:
            return pa.Table.from_pylist([], schema=MERGE_SCHEMA)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([group["doc_id"][0].as_py()], type=pa.int64()),
                "text_md5": pa.array([md5s[0]], type=pa.string()),
            },
            schema=MERGE_SCHEMA,
        )

    return (
        new_ds.map_batches(tag_new, batch_format="pyarrow")
        .union(marks)
        .groupby("doc_id")
        .map_groups(survivors, batch_format="pyarrow")
    )


def source_dup_rate(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(source, n_docs, n_dup_docs, dup_rate_fp6) — per-source exact-
    duplicate exposure: how many of a source's documents share their
    md5 with ANY other document corpus-wide (cross-source dups count
    for both sides). The per-source dedup-savings report a mixture
    rebalancer reads before re-weighting.

    Shape: per-block (md5, source) partials with per-pair counts →
    keyed groupby on md5 carrying the per-source breakdown as rows
    (one row per (md5, source) — the md5 exchange is payload-free) →
    groups with total > 1 emit their per-source dup counts → ONE tiny
    keyed sum over the bounded source domain, joined driver-side with
    the per-source totals from the same partial pass.

    Oracle: md5 HAVING > 1 semi-join, grouped by source."""
    import hashlib

    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        t = pa.Table.from_pydict(
            {
                "md5": pa.array(md5s, type=pa.string()),
                "source": batch["source"],
                "n": pa.array(
                    np.ones(len(md5s), dtype=np.int64), type=pa.int64()
                ),
            }
        )
        g = t.group_by(["md5", "source"]).aggregate([("n", "sum")])
        return g.rename_columns(["md5", "source", "n"])

    per_pair = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["md5", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def dup_partial(group: pa.Table) -> pa.Table:
        total = int(
            np.sum(group["n"].to_numpy(zero_copy_only=False))
        )
        if total <= 1:
            return pa.Table.from_pydict(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_dup_docs": pa.array([], type=pa.int64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "source": group["source"],
                "n_dup_docs": group["n"].cast(pa.int64()),
            }
        )

    dups = (
        per_pair.groupby("md5")
        .map_groups(dup_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_dup_docs", alias_name="n_dup_docs"))
        .take_all()
    )  # bounded: #sources

    def totals_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {"source": batch["source"], "n_docs": batch["n"].cast(pa.int64())}
        )
        g = t.group_by(["source"]).aggregate([("n_docs", "sum")])
        return g.rename_columns(["source", "n_docs"])

    totals = {
        r["source"]: r["n_docs"]
        for r in per_pair.map_batches(totals_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    }
    dup_map = {r["source"]: r["n_dup_docs"] for r in dups}
    keys = sorted(totals)
    nd = [totals[s] for s in keys]
    du = [dup_map.get(s, 0) for s in keys]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "source": pa.array(keys, type=pa.string()),
                "n_docs": pa.array(nd, type=pa.int64()),
                "n_dup_docs": pa.array(du, type=pa.int64()),
                "dup_rate_fp6": pa.array(
                    [d * 1_000_000 // n for d, n in zip(du, nd)],
                    type=pa.int64(),
                ),
            }
        )
    )


def dup_cluster_size_hist(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(cluster_size, n_clusters, n_docs) — histogram of exact-duplicate
    cluster sizes: how many md5-identical groups of each size the corpus
    holds and how many documents they cover. With [[source_dup_rate]]
    and [[near_dup_degree_hist]] this completes the dedup-planner
    censuses: expected savings = Σ (size−1)·n_clusters over size > 1.

    Shape: per-block (md5, count) partials → ONE keyed md5 groupby →
    per-block size-histogram partials → ONE tiny keyed sum over the
    bounded size domain. The md5 exchange is payload-free; text never
    leaves its block.

    Oracle: GROUP BY md5 → GROUP BY count."""
    import hashlib

    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        t = pa.Table.from_pydict(
            {
                "md5": pa.array(md5s, type=pa.string()),
                "n": pa.array(
                    np.ones(len(md5s), dtype=np.int64), type=pa.int64()
                ),
            }
        )
        g = t.group_by(["md5"]).aggregate([("n", "sum")])
        return g.rename_columns(["md5", "n"])

    per_md5 = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("md5")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        sizes = batch["n"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(sizes, return_counts=True)
        return pa.Table.from_pydict(
            {
                "cluster_size": pa.array(keys, type=pa.int64()),
                "n_clusters": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        per_md5.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        cs = batch["cluster_size"].to_numpy(zero_copy_only=False)
        nc = batch["n_clusters"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "cluster_size": pa.array(cs, type=pa.int64()),
                "n_clusters": pa.array(nc, type=pa.int64()),
                "n_docs": pa.array(cs * nc, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cross_source_dup_matrix(
    ds: ray.data.Dataset, n: int = 5
) -> ray.data.Dataset:
    """(src_a, src_b, n_shared) — cross-source contamination matrix: for
    every unordered source pair, the number of DISTINCT word ``n``-gram
    shingles present in both sources' documents. The who-copies-from-whom
    diagnostic a crawl-curation team reads before weighting sources:
    a hot cell means two feeds overlap (mirror, scraper, syndication)
    and their mixture weights double-count the same text.

    Scale shape: docs explode to per-block-DISTINCT (shingle-hash,
    source) pairs (the 60-bit md5 [[shingle_base_hash]]; text never
    rides); ONE keyed groupby on the hash emits each group's unordered
    source-pair set (≤ C(#sources, 2) rows per group — #sources is
    small by construction); ONE tiny keyed (src_a, src_b) sum. Collision
    semantics are shared with the oracle by construction.

    Oracle: DISTINCT (hash, source) self-join with src_a < src_b."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    from .textstats import ascii_tokens

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_s: list[str] = []
        for src, t in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(t)
            for sh in {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }:
                out_h.append(shingle_base_hash(sh))
                out_s.append(src)
        return pa.Table.from_pydict(
            {
                "bh": pa.array(out_h, type=pa.int64()),
                "source": pa.array(out_s, type=pa.string()),
            }
        )

    PAIR_SCHEMA = pa.schema(
        [("src_a", pa.string()), ("src_b", pa.string()), ("n_shared", pa.int64())]
    )

    def pair_marks(group: pa.Table) -> pa.Table:
        srcs = sorted(set(group["source"].to_pylist()))
        if len(srcs) < 2:
            return pa.Table.from_pylist([], schema=PAIR_SCHEMA)
        pairs = list(combinations(srcs, 2))
        return pa.Table.from_pydict(
            {
                "src_a": pa.array([a for a, _ in pairs], type=pa.string()),
                "src_b": pa.array([b for _, b in pairs], type=pa.string()),
                "n_shared": pa.array([1] * len(pairs), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bh")
        .map_groups(pair_marks, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n_shared", alias_name="n_shared"))
    )


def lsh_band_sweep(
    ds: ray.data.Dataset, band_counts: tuple[int, ...] = (2, 4, 8)
) -> ray.data.Dataset:
    """(n_bands, rows_per_band, n_candidates) — LSH parameter sweep: the
    distinct candidate-pair count the 16-perm minhash signature would
    produce under each banding (more bands → shorter keys → higher
    recall AND more false candidates). The tuning artifact read before
    committing a banding to a 10^12-doc dedup run — candidates cost an
    exact-verify each, so this curve IS the budget curve. One signature
    pass serves every configuration; the [[minhash_candidates]]
    exact-text rep collapse applies per bucket (same skew guard).

    Scale shape: one signature map emits Σ n_bands rows per doc; ONE
    keyed (n_bands, band, key) groupby expands per-bucket rep pairs;
    ONE (n_bands, pair) distinct groupby; ONE tiny per-config sum.

    Oracle: the shared signature CTE re-banded per config."""
    from ray.data.aggregate import Count, Sum

    def sweep_band_rows(batch: pa.Table) -> pa.Table:
        doc_ids, nbs, bands, keys, md5s = [], [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = shingle_set(text)
            if not sh:
                continue
            sig = minhash_signature(sh)
            h = _md5(text)
            for nb in band_counts:
                r = len(sig) // nb
                for b in range(nb):
                    key = _md5(
                        "|".join(str(v) for v in sig[b * r : (b + 1) * r])
                    )
                    doc_ids.append(doc_id)
                    nbs.append(nb)
                    bands.append(b)
                    keys.append(key)
                    md5s.append(h)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_bands": pa.array(nbs, type=pa.int64()),
                "band": pa.array(bands, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "text_md5": pa.array(md5s, type=pa.string()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        reps: dict[str, int] = {}
        for doc_id, h in zip(
            group["doc_id"].to_pylist(), group["text_md5"].to_pylist()
        ):
            if h not in reps or doc_id < reps[h]:
                reps[h] = doc_id
        ids = sorted(reps.values())
        nb = int(group["n_bands"][0].as_py())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.Table.from_pydict(
            {
                "n_bands": pa.array([nb] * len(a), type=pa.int64()),
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
            }
        )

    distinct_pairs = (
        ds.map_batches(sweep_band_rows, batch_format="pyarrow")
        .groupby(["n_bands", "band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["n_bands", "doc_a", "doc_b"])
        .aggregate(Count())
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "n_bands": batch["n_bands"].cast(pa.int64()),
                "n_candidates": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["n_bands"]).aggregate([("n_candidates", "sum")])
        return g.rename_columns(["n_bands", "n_candidates"])

    sig_len = 16  # NUM_BANDS * ROWS_PER_BAND — the fixed signature width

    def finish(batch: pa.Table) -> pa.Table:
        nb = batch["n_bands"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n_bands": pa.array(nb, type=pa.int64()),
                "rows_per_band": pa.array(sig_len // nb, type=pa.int64()),
                "n_candidates": batch["n_candidates"].cast(pa.int64()),
            }
        )

    return (
        distinct_pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("n_bands")
        .aggregate(Sum("n_candidates", alias_name="n_candidates"))
        .map_batches(finish, batch_format="pyarrow")
    )


def dedup_candidates_recall(
    ds: ray.data.Dataset,
    tau_fp6: int = 500_000,
    size_broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(tau_fp6, n_truth, n_candidates, n_hit, recall_fp5) — the text-
    dedup acceptance gate ([[knn_recall_report]]'s twin): recall of the
    [[minhash_candidates]] LSH pair set against the EXACT ground truth —
    every pair of exact-text representatives with 3-gram-hash Jaccard
    ≥ tau (cross-multiplied integer inequality, no float division).
    Banding theory predicts the recall at a given tau; this measures it
    on the actual corpus before a 10^12-doc dedup run commits to the
    banding ([[lsh_band_sweep]] gives the cost side of the trade).

    Scale shape: ground truth WITHOUT an all-pairs pass — intersections
    count per shared DISTINCT shingle hash, via ONE global sort by
    (shingle hash, text md5, doc) and fully VECTORIZED in-block
    triangular pair expansion of the interior buckets (the basket_pairs
    machinery — a per-bucket map_groups here would make one Python call
    per distinct shingle, millions at corpus scale); the <= 2 buckets
    touching each block edge fold on the driver. Per-doc
    distinct-shingle sizes attach through two keyed tagged unions; LSH
    candidates and truth meet in ONE pair-keyed union. Int rows on every
    exchange; text rides nothing. Co-bucket pair volume is the same
    quantity the LSH run itself pays — skew-capped by construction of
    the 60-bit hash domain.

    Oracle: the shared signature CTE's rep/shingle prefix + hashed-list
    intersections over the O(n²) rep pair join (same answer, different
    asymptotics)."""
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        # In-batch rep pre-collapse (min doc per distinct text) BEFORE
        # shingling: exact copies inside a batch shingle once. The md5
        # rides as two int64 halves so every downstream compare/sort is
        # on ints, never 32-char strings.
        reps: dict[str, int] = {}
        texts: dict[str, str] = {}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            m = _md5(text)
            if m not in reps or doc_id < reps[m]:
                reps[m] = doc_id
                texts[m] = text
        out_h: list[int] = []
        out_d: list[int] = []
        out_hi: list[int] = []
        out_lo: list[int] = []
        for m, doc_id in reps.items():
            hs = {shingle_base_hash(s) for s in shingle_set(texts[m])}
            if not hs:
                continue
            hi = int(m[:16], 16) - 2**63
            lo = int(m[16:], 16) - 2**63
            for h in hs:
                out_h.append(h)
                out_d.append(doc_id)
                out_hi.append(hi)
                out_lo.append(lo)
        return pa.Table.from_pydict(
            {
                "bh": pa.array(out_h, type=pa.int64()),
                "m_hi": pa.array(out_hi, type=pa.int64()),
                "m_lo": pa.array(out_lo, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
            }
        )

    PAIR = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("inter", pa.int64())]
    )

    def _empty_pairs() -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
            },
            schema=PAIR,
        )

    sorted_ds = (
        ds.map_batches(explode, batch_format="pyarrow")
        .sort(["bh", "m_hi", "m_lo", "doc_id"])
        .materialize()
    )

    def interior_pairs(batch: pa.Table) -> pa.Table:
        bh = batch["bh"].to_numpy(zero_copy_only=False)
        if len(bh) == 0:
            return _empty_pairs()
        hi = batch["m_hi"].to_numpy(zero_copy_only=False)
        lo = batch["m_lo"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        inner = (bh != bh[0]) & (bh != bh[-1])
        # in-block (bh, md5) rep collapse: first row of each run is the
        # min doc (doc is the last sort key); a run crossing a block
        # edge has its bh at the edge and is a boundary bucket
        dup = np.zeros(len(bh), dtype=bool)
        dup[1:] = (
            (bh[1:] == bh[:-1]) & (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1])
        )
        keep = inner & ~dup
        bhi, di = bh[keep], d[keep]
        n = len(bhi)
        if n < 2:
            return _empty_pairs()
        # triangular expansion: position p of a bucket sized g pairs
        # with the (g-1-p) rows after it (basket_pairs machinery)
        new_grp = np.r_[True, bhi[1:] != bhi[:-1]]
        gid = np.cumsum(new_grp) - 1
        sizes = np.bincount(gid)
        ends = np.cumsum(sizes) - 1
        r_e = ends[gid] - np.arange(n)
        total = int(r_e.sum())
        if total == 0:
            return _empty_pairs()
        ia = np.repeat(np.arange(n), r_e)
        cum0 = np.cumsum(r_e) - r_e
        jb = ia + 1 + (np.arange(total) - np.repeat(cum0, r_e))
        a = np.minimum(di[ia], di[jb])
        b = np.maximum(di[ia], di[jb])
        # in-block pair combiner (lexsort run-length, no key packing —
        # doc ids need not fit 31 bits): the pair-key shuffle carries
        # one row per distinct in-block pair
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        idx = np.flatnonzero(new)
        cnt = np.diff(np.r_[idx, len(a)])
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(a[idx], type=pa.int64()),
                "doc_b": pa.array(b[idx], type=pa.int64()),
                "inter": pa.array(cnt.astype(np.int64)),
            },
            schema=PAIR,
        )

    def boundary_rows(batch: pa.Table) -> pa.Table:
        bh = batch["bh"].to_numpy(zero_copy_only=False)
        if len(bh) == 0:
            return batch
        return batch.filter(pa.array((bh == bh[0]) | (bh == bh[-1])))

    interior = sorted_ds.map_batches(interior_pairs, batch_format="pyarrow")
    # boundary buckets are O(2 x #blocks) buckets of df-bounded size:
    # fold them on the driver (the basket_pairs pattern)
    per_bucket: dict[int, dict[tuple[int, int], int]] = {}
    for r in sorted_ds.map_batches(
        boundary_rows, batch_format="pyarrow"
    ).take_all():
        mp = per_bucket.setdefault(r["bh"], {})
        k = (r["m_hi"], r["m_lo"])
        if k not in mp or r["doc_id"] < mp[k]:
            mp[k] = r["doc_id"]
    bpairs: dict[tuple[int, int], int] = {}
    for mp in per_bucket.values():
        ids = sorted(mp.values())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                kk = (ids[i], ids[j])
                bpairs[kk] = bpairs.get(kk, 0) + 1
    boundary = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_a": pa.array([k[0] for k in bpairs], type=pa.int64()),
                "doc_b": pa.array([k[1] for k in bpairs], type=pa.int64()),
                "inter": pa.array(list(bpairs.values()), type=pa.int64()),
            },
            schema=PAIR,
        )
    )
    # high-cardinality pair-key fold: sort + run-length, NOT groupby —
    # Ray's sort-aggregate pays per-group Python at ~1M distinct pairs
    from .exchange import keyed_sum

    inters = keyed_sum(interior.union(boundary), ["doc_a", "doc_b"], "inter")

    # Per-rep distinct-shingle sizes: (doc_id, size) — reps only (the
    # exact-dup copies of a rep share its md5; min-doc wins per block,
    # then globally via the min aggregate).
    def size_rows(batch: pa.Table) -> pa.Table:
        rows: dict[str, tuple[int, int]] = {}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            hs = {shingle_base_hash(s) for s in shingle_set(text)}
            if not hs:
                continue
            md5 = _md5(text)
            if md5 not in rows or doc_id < rows[md5][0]:
                rows[md5] = (doc_id, len(hs))
        return pa.Table.from_pydict(
            {
                "text_md5": pa.array(list(rows), type=pa.string()),
                "doc_id": pa.array(
                    [v[0] for v in rows.values()], type=pa.int64()
                ),
                "size": pa.array(
                    [v[1] for v in rows.values()], type=pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Min

    sizes = (
        ds.map_batches(size_rows, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Min("size", alias_name="size"))
        .materialize()  # consumed twice below whichever path runs
    )
    n_sizes = int(sizes.count())

    # Attach size_a then size_b through keyed tagged unions on the doc id.
    ATT = pa.schema(
        [
            ("key", pa.int64()),
            ("other", pa.int64()),
            ("inter", pa.int64()),
            ("size", pa.int64()),
            ("kind", pa.int8()),
        ]
    )

    def tag_pairs_on(col_key: str, col_other: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.Table.from_pydict(
                {
                    "key": batch[col_key].cast(pa.int64()),
                    "other": batch[col_other].cast(pa.int64()),
                    "inter": batch["inter"].cast(pa.int64()),
                    "size": pa.array([0] * n, type=pa.int64()),
                    "kind": pa.array([1] * n, type=pa.int8()),
                },
                schema=ATT,
            )

        return fn

    def tag_sizes(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "key": batch["doc_id"].cast(pa.int64()),
                "other": pa.array([0] * n, type=pa.int64()),
                "inter": pa.array([0] * n, type=pa.int64()),
                "size": batch["size"].cast(pa.int64()),
                "kind": pa.array([0] * n, type=pa.int8()),
            },
            schema=ATT,
        )

    def attach(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        srow = np.flatnonzero(kind == 0)
        prow = np.flatnonzero(kind == 1)
        if len(srow) == 0 or len(prow) == 0:
            return pa.Table.from_pylist([], schema=ATT)
        size = int(group["size"][int(srow[0])].as_py())
        sel = group.take(prow)
        return pa.Table.from_pydict(
            {
                "key": sel["other"],  # re-key on the OTHER endpoint
                "other": sel["key"],
                "inter": sel["inter"],
                "size": pa.array(
                    np.maximum(
                        sel["size"].to_numpy(zero_copy_only=False), 0
                    )
                    + size,
                    type=pa.int64(),
                ),
                "kind": pa.array([1] * sel.num_rows, type=pa.int8()),
            },
            schema=ATT,
        )

    # pass 1: key on doc_a, accumulate size_a (size carries the running
    # sum); pass 2: key on doc_b (already re-keyed), add size_b.
    pass1 = (
        inters.map_batches(tag_pairs_on("doc_a", "doc_b"), batch_format="pyarrow")
        .union(sizes.map_batches(tag_sizes, batch_format="pyarrow"))
        .groupby("key")
        .map_groups(attach, batch_format="pyarrow")
    )
    pass2 = (
        pass1.union(sizes.map_batches(tag_sizes, batch_format="pyarrow"))
        .groupby("key")
        .map_groups(attach, batch_format="pyarrow")
    )

    # pass2 rows: key=doc_a (re-keyed back), other=doc_b, size=sa+sb.
    def truth_rows(batch: pa.Table) -> pa.Table:
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        both = batch["size"].to_numpy(zero_copy_only=False)
        union = both - inter
        keep = inter * 1_000_000 >= tau_fp6 * union
        t = batch.filter(pa.array(keep))
        a = t["key"].to_numpy(zero_copy_only=False)
        b = t["other"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(np.minimum(a, b), type=pa.int64()),
                "doc_b": pa.array(np.maximum(a, b), type=pa.int64()),
                "in_truth": pa.array(np.ones(len(a), dtype=np.int64)),
                "in_lsh": pa.array(np.zeros(len(a), dtype=np.int64)),
            }
        )

    truth = pass2.map_batches(truth_rows, batch_format="pyarrow")
    if n_sizes <= size_broadcast_limit:
        # Broadcast fast path: the (rep doc -> distinct-shingle size)
        # map is two int64 columns of <= size_broadcast_limit entries —
        # ship it once via ray.put and score every truth pair in one
        # vectorized map_batches, replacing the two keyed tagged-union
        # attach passes above (each one Python map_groups call per rep).
        # Above the limit (10^12-doc scale, where the rep-size map
        # exceeds driver memory) the lazy pass1/pass2 plan runs instead;
        # a path-equality test forces size_broadcast_limit=0.
        sp = sizes.to_pandas()
        s_keys = sp["doc_id"].to_numpy().astype(np.int64)
        s_order = np.argsort(s_keys)
        s_keys = s_keys[s_order]
        s_vals = sp["size"].to_numpy().astype(np.int64)[s_order]
        sz_ref = ray.put((s_keys, s_vals))

        def truth_rows_bc(batch: pa.Table, _ref=sz_ref) -> pa.Table:
            keys, vals = ray.get(_ref)
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            inter = batch["inter"].to_numpy(zero_copy_only=False)
            both = (
                vals[np.searchsorted(keys, a)]
                + vals[np.searchsorted(keys, b)]
            )
            union = both - inter
            keep = inter * 1_000_000 >= tau_fp6 * union
            t_a, t_b = a[keep], b[keep]
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array(t_a, type=pa.int64()),
                    "doc_b": pa.array(t_b, type=pa.int64()),
                    "in_truth": pa.array(np.ones(len(t_a), dtype=np.int64)),
                    "in_lsh": pa.array(np.zeros(len(t_a), dtype=np.int64)),
                }
            )

        truth = inters.map_batches(truth_rows_bc, batch_format="pyarrow")

    def lsh_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_a": batch["doc_a"].cast(pa.int64()),
                "doc_b": batch["doc_b"].cast(pa.int64()),
                "in_truth": pa.array([0] * n, type=pa.int64()),
                "in_lsh": pa.array([1] * n, type=pa.int64()),
            }
        )

    merged = (
        truth.union(
            minhash_candidates(ds).map_batches(
                lsh_rows, batch_format="pyarrow"
            )
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(
            Sum("in_truth", alias_name="in_truth"),
            Sum("in_lsh", alias_name="in_lsh"),
        )
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = batch["in_truth"].to_numpy(zero_copy_only=False) > 0
        l = batch["in_lsh"].to_numpy(zero_copy_only=False) > 0
        return pa.Table.from_pydict(
            {
                "g": pa.array([0], type=pa.int32()),
                "n_truth": pa.array([int(t.sum())], type=pa.int64()),
                "n_candidates": pa.array([int(l.sum())], type=pa.int64()),
                "n_hit": pa.array([int((t & l).sum())], type=pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        nt = int(group["n_truth"].to_numpy(zero_copy_only=False).sum())
        nc = int(group["n_candidates"].to_numpy(zero_copy_only=False).sum())
        nh = int(group["n_hit"].to_numpy(zero_copy_only=False).sum())
        return pa.Table.from_pydict(
            {
                "tau_fp6": pa.array([tau_fp6], type=pa.int64()),
                "n_truth": pa.array([nt], type=pa.int64()),
                "n_candidates": pa.array([nc], type=pa.int64()),
                "n_hit": pa.array([nh], type=pa.int64()),
                "recall_fp5": pa.array(
                    [nh * 100_000 // nt if nt else 0], type=pa.int64()
                ),
            }
        )

    return (
        merged.map_batches(count_partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )


def simhash_nearest(
    ds: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """(doc_id, nearest_hamming) — per-representative distance to the
    nearest OTHER fingerprint within the SimHash Hamming ball: the
    margin diagnostic behind a [[simhash_near_dup]] threshold choice
    (documents at distance exactly ``max_hamming`` are one bit flip from
    dropping out — a cluster of them means the threshold sits on a
    density ridge and should move). Representatives with no neighbor
    inside the ball are omitted (both sides agree).

    Scale shape: the pigeonhole pair set rides once; each pair explodes
    to its two directed rows and ONE keyed doc groupby takes the min."""
    from ray.data.aggregate import Min

    pairs = simhash_near_dup(ds, max_hamming=max_hamming)

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        h = batch["hamming"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "nearest_hamming": pa.array(
                    np.concatenate([h, h]), type=pa.int64()
                ),
            }
        )

    return (
        pairs.map_batches(explode, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("nearest_hamming", alias_name="nearest_hamming"))
    )


def winnow_density_check(
    ds: ray.data.Dataset, k: int = 5, w: int = 4
) -> ray.data.Dataset:
    """(doc_id, n_fp, max_gap, gap_ok) — fingerprinting guarantee audit:
    winnowing promises every window of ``w`` consecutive k-gram
    positions contains a selected fingerprint, i.e. consecutive selected
    positions never differ by more than ``w``. A violation means the
    selection rule (or a port of it) is broken — the eval-family gate
    for [[winnow_fingerprints]] ([[span_integrity]]'s cousin for the
    fingerprint stream). Runs the real selector and audits its output;
    on a correct implementation every row has gap_ok = true (the audit
    is the point — it runs after any selector change).

    Scale shape: the selector's per-doc map output rides ONE keyed doc
    groupby; the per-group audit is a sort + diff."""
    fp = winnow_fingerprints(ds, k=k, w=w)

    OUT = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_fp", pa.int64()),
            ("max_gap", pa.int64()),
            ("gap_ok", pa.bool_()),
        ]
    )

    def per_doc(group: pa.Table) -> pa.Table:
        pos = np.sort(group["pos"].to_numpy(zero_copy_only=False))
        gap = int(np.diff(pos).max()) if len(pos) >= 2 else 0
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [group["doc_id"][0].as_py()], type=pa.int64()
                ),
                "n_fp": pa.array([len(pos)], type=pa.int64()),
                "max_gap": pa.array([gap], type=pa.int64()),
                "gap_ok": pa.array([gap <= w], type=pa.bool_()),
            },
            schema=OUT,
        )

    return fp.groupby("doc_id").map_groups(per_doc, batch_format="pyarrow")


def dup_cluster_source_mix(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(cluster_rep, n_docs, n_sources) — syndication evidence at cluster
    granularity: for every non-singleton near-dup cluster
    ([[dedup_clusters]] connected components), how many documents it
    holds and how many DISTINCT sources they span. A multi-source
    cluster is content syndicated (or scraped) across feeds — the
    cluster-level view of [[cross_source_dup_matrix]], read when
    deciding which source keeps the canonical copy.

    Scale shape: cluster labels and (doc, source) rows meet in ONE
    doc-keyed tagged union; per-(cluster, source) distinct collapse,
    then ONE tiny cluster groupby."""
    from ray.data.aggregate import Count, Sum

    clusters = dedup_clusters(ds)

    def tag_cluster(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "cluster_rep": batch["cluster_rep"].cast(pa.int64()),
                "source": pa.array([""] * batch.num_rows, type=pa.string()),
            }
        )

    def tag_source(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "cluster_rep": pa.array(
                    [-1] * batch.num_rows, type=pa.int64()
                ),
                "source": batch["source"].cast(pa.string()),
            }
        )

    JOINED = pa.schema(
        [("cluster_rep", pa.int64()), ("source", pa.string())]
    )

    def attach(group: pa.Table) -> pa.Table:
        reps = group["cluster_rep"].to_numpy(zero_copy_only=False)
        crow = np.flatnonzero(reps >= 0)
        srow = np.flatnonzero(reps < 0)
        if len(crow) == 0 or len(srow) == 0:
            return pa.Table.from_pylist([], schema=JOINED)
        rep = int(reps[crow[0]])
        return pa.Table.from_pydict(
            {
                "cluster_rep": pa.array(
                    [rep] * len(srow), type=pa.int64()
                ),
                "source": group.take(srow)["source"],
            },
            schema=JOINED,
        )

    per_pair = (
        clusters.map_batches(tag_cluster, batch_format="pyarrow")
        .union(
            ds.map_batches(tag_source, batch_format="pyarrow")
        )
        .groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["cluster_rep", "source"])
        .aggregate(Count())
    )

    def cluster_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "cluster_rep": batch["cluster_rep"].cast(pa.int64()),
                "n_docs": batch["count()"].cast(pa.int64()),
                "n_sources": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["cluster_rep"]).aggregate(
            [("n_docs", "sum"), ("n_sources", "sum")]
        )
        return g.rename_columns(["cluster_rep", "n_docs", "n_sources"])

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(nd > 1))
        return pa.Table.from_pydict(
            {
                "cluster_rep": t["cluster_rep"].cast(pa.int64()),
                "n_docs": t["n_docs"].cast(pa.int64()),
                "n_sources": t["n_sources"].cast(pa.int64()),
            }
        )

    return (
        per_pair.map_batches(cluster_partial, batch_format="pyarrow")
        .groupby("cluster_rep")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_sources", alias_name="n_sources"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def _scored_candidate_pairs(
    ds: ray.data.Dataset,
    payload_fn,
    score_fn,
    score_name: str,
    semi_join: bool | None = None,
    candidate_limit: int = 2_000_000,
    cand: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Shared verification-join core for per-candidate-pair scorers: LSH
    banding candidates (exact-distinct reps, [[minhash_candidates]]) ->
    attach a per-doc payload (``payload_fn(text) -> list[str]``) to each
    side through ONE doc-keyed exchange -> score each pair
    (``score_fn(payload_a, payload_b) -> int``) in a pair-keyed groupby.
    The same two-shuffle plan, broadcast/semi-join auto-route and
    candidate materialization as ``ngram_jaccard`` (that function predates
    this helper and keeps its own inline copy to preserve its green
    bit-parity); payloads never pass through the driver.

    ``cand`` overrides the candidate generator with a caller-supplied
    (doc_a, doc_b) dataset (duplicate pairs fine — the pair-keyed
    groupby emits one row per pair either way); the default is minhash
    banding. The broadcast route holds only the candidate DOC-ID SET
    (ints) on the driver under ``candidate_limit``; above it, texts ride
    the doc-key shuffle and the payload is computed only for groups with
    side rows."""
    import ray

    if cand is None:
        cand = minhash_candidates(ds, distinct=False)
    cand = cand.materialize()
    if semi_join is None:
        semi_join = cand.count() > candidate_limit
    needed_ref = None
    if not semi_join:
        needed_set = set()
        for batch in cand.iter_batches(batch_format="pyarrow"):
            needed_set.update(batch["doc_a"].to_pylist())
            needed_set.update(batch["doc_b"].to_pylist())
        needed_ref = ray.put(needed_set)

    SIDE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("pair_a", pa.int64()),
            ("pair_b", pa.int64()),
            ("payload", pa.list_(pa.string())),
            ("text", pa.string()),
        ]
    )

    def explode_sides(batch: pa.Table) -> pa.Table:
        ids, a_, b_ = [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            ids.extend((a, b))
            a_.extend((a, a))
            b_.extend((b, b))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pair_a": pa.array(a_, type=pa.int64()),
                "pair_b": pa.array(b_, type=pa.int64()),
                "payload": pa.array([None] * len(ids), type=pa.list_(pa.string())),
                "text": pa.array([""] * len(ids), type=pa.string()),
            },
            schema=SIDE_SCHEMA,
        )

    def doc_payloads(batch: pa.Table) -> pa.Table:
        needed = ray.get(needed_ref)
        ids, pl = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if doc_id in needed:
                ids.append(doc_id)
                pl.append(payload_fn(text))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pair_a": pa.array([-1] * len(ids), type=pa.int64()),
                "pair_b": pa.array([-1] * len(ids), type=pa.int64()),
                "payload": pa.array(pl, type=pa.list_(pa.string())),
                "text": pa.array([""] * len(ids), type=pa.string()),
            },
            schema=SIDE_SCHEMA,
        )

    def doc_texts(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pair_a": pa.array([-1] * n, type=pa.int64()),
                "pair_b": pa.array([-1] * n, type=pa.int64()),
                "payload": pa.array([None] * n, type=pa.list_(pa.string())),
                "text": batch["text"],
            },
            schema=SIDE_SCHEMA,
        )

    def attach(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        sides = [r for r in rows if r["pair_a"] != -1]
        if not sides:
            return pa.Table.from_pylist([], schema=SIDE_SCHEMA)
        doc = next((r for r in rows if r["pair_a"] == -1), None)
        if doc is None:
            pl = []
        elif doc["payload"] is not None:
            pl = doc["payload"]
        else:
            pl = payload_fn(doc["text"])  # semi-join: payload on demand
        out = [{**r, "payload": pl, "text": ""} for r in sides]
        return pa.Table.from_pylist(out, schema=SIDE_SCHEMA)

    OUT_SCHEMA = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            (score_name, pa.int64()),
        ]
    )

    def score_pair(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        a = rows[0]["pair_a"]
        b = rows[0]["pair_b"]
        pl_a = next((r["payload"] for r in rows if r["doc_id"] == a), [])
        pl_b = next((r["payload"] for r in rows if r["doc_id"] == b), [])
        return pa.Table.from_pylist(
            [{"doc_a": a, "doc_b": b, score_name: score_fn(pl_a, pl_b)}],
            schema=OUT_SCHEMA,
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    doc_fn = doc_texts if semi_join else doc_payloads
    docs_side = ds.map_batches(doc_fn, batch_format="pyarrow")
    attached = (
        docs_side.union(sides)
        .groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
    )
    return attached.groupby(["pair_a", "pair_b"]).map_groups(
        score_pair, batch_format="pyarrow"
    )


def containment_pairs(
    ds: ray.data.Dataset,
    semi_join: bool | None = None,
    candidate_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(doc_a, doc_b, containment_fp6) — exact max-side 3-gram
    CONTAINMENT |A∩B| / min(|A|, |B|) for every LSH candidate pair,
    fixed-point 1e6. Containment is the asymmetric near-dup signal
    Jaccard misses: a short document quoted verbatim inside a long one
    scores ~1.0 here but arbitrarily low Jaccard (Broder's resemblance
    vs containment distinction) — the quote/subset duplicates a
    training-data curator wants to catch before loss-weighting.

    Same two-shuffle verification-join scale shape as
    [[dedup_ngram_jaccard]] via ``_scored_candidate_pairs``.

    Oracle: the shared shingles CTE + list_intersect over LEAST of the
    two set sizes."""
    from . import fp

    def score(pl_a: list[str], pl_b: list[str]) -> int:
        sa, sb = set(pl_a), set(pl_b)
        m = min(len(sa), len(sb))
        return fp(len(sa & sb) * 1000000.0 / m, 0) if m else 0

    return _scored_candidate_pairs(
        ds,
        payload_fn=shingle_set,
        score_fn=score,
        score_name="containment_fp6",
        semi_join=semi_join,
        candidate_limit=candidate_limit,
    )


def weighted_jaccard_pairs(
    ds: ray.data.Dataset,
    semi_join: bool | None = None,
    candidate_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(doc_a, doc_b, wjaccard_fp6) — exact MULTISET (bag-of-tokens)
    Jaccard sum(min(cA,cB)) / sum(max(cA,cB)) for every LSH candidate
    pair, fixed-point 1e6. The weighted variant separates true rewrites
    from repetition-only edits that set-Jaccard conflates: duplicating
    a paragraph in place leaves the shingle SET nearly unchanged but
    shifts token multiplicities. sum(max) never materializes the token
    union: it is totalA + totalB - sum(min) (inclusion–exclusion on
    bags), so the score needs only the two payloads.

    Payloads are raw token lists (multiplicity preserved) riding the
    same two-shuffle verification join as [[dedup_ngram_jaccard]];
    candidates are the standard set-minhash bands (a containment-biased
    generator, reused so the oracle's candidate CTE is shared verbatim).

    Oracle: shared shingles-CTE candidates + per-token count join,
    m = SUM(LEAST) over common tokens, wj = m / (nA + nB - m)."""
    from collections import Counter

    from . import fp

    from .textstats import ascii_tokens

    def score(pl_a: list[str], pl_b: list[str]) -> int:
        ca, cb = Counter(pl_a), Counter(pl_b)
        m = sum(min(n, cb[t]) for t, n in ca.items() if t in cb)
        denom = len(pl_a) + len(pl_b) - m
        return fp(m * 1000000.0 / denom, 0) if denom else 0

    return _scored_candidate_pairs(
        ds,
        payload_fn=ascii_tokens,
        score_fn=score,
        score_name="wjaccard_fp6",
        semi_join=semi_join,
        candidate_limit=candidate_limit,
    )


def truncation_dups(
    ds: ray.data.Dataset, prefix_chars: int = 64
) -> ray.data.Dataset:
    """(prefix_md5, n_docs, n_texts, keep_doc_id) — groups of documents
    that share their first ``prefix_chars`` CHARACTERS (code points, the
    Python slice / SQL substr contract) while differing somewhere in the
    full text: the truncation/expansion duplicates (same article cut at
    different lengths, same boilerplate head with divergent tails) that
    exact dedup misses and shingle LSH only catches when the overlap
    ratio is high. ``n_texts`` counts DISTINCT full texts in the group;
    groups that are pure exact copies (n_texts == 1) are excluded —
    those are [[dedup_exact]]'s output.

    Scale shape: per-block Arrow group_by collapses to one
    (prefix_md5, text_md5) row per distinct pair per block, ONE
    keyed_fold finishes the pair collapse, a second per-block partial +
    keyed_fold folds pairs into per-prefix (n_docs, n_texts, min doc)
    counters — two payload-free hash-key exchanges, no text ever
    shuffles, driver state O(#blocks).

    Oracle: GROUP BY md5(substr(text,1,k)) HAVING COUNT(*)>1 AND
    COUNT(DISTINCT md5(text))>1."""
    from .exchange import keyed_fold

    def pair_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        t = pa.Table.from_pydict(
            {
                "prefix_md5": pa.array(
                    [_md5(s[:prefix_chars]) for s in texts], type=pa.string()
                ),
                "text_md5": pa.array([_md5(s) for s in texts], type=pa.string()),
                "doc_id": batch["doc_id"].cast(pa.int64()),
            }
        )
        g = t.group_by(["prefix_md5", "text_md5"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        )
        return pa.Table.from_pydict(
            {
                "prefix_md5": g["prefix_md5"],
                "text_md5": g["text_md5"],
                "n": g["doc_id_count"].cast(pa.int64()),
                "min_doc": g["doc_id_min"].cast(pa.int64()),
            }
        )

    per_pair = keyed_fold(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["prefix_md5", "text_md5"],
        [("n", "sum"), ("min_doc", "min")],
    )

    def prefix_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["prefix_md5"]).aggregate(
            [("n", "sum"), ("text_md5", "count"), ("min_doc", "min")]
        )
        return pa.Table.from_pydict(
            {
                "prefix_md5": g["prefix_md5"],
                "n_docs": g["n_sum"].cast(pa.int64()),
                "n_texts": g["text_md5_count"].cast(pa.int64()),
                "keep_doc_id": g["min_doc_min"].cast(pa.int64()),
            }
        )

    per_prefix = keyed_fold(
        per_pair.map_batches(prefix_partial, batch_format="pyarrow"),
        ["prefix_md5"],
        [("n_docs", "sum"), ("n_texts", "sum"), ("keep_doc_id", "min")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.greater(batch["n_docs"], 1), pc.greater(batch["n_texts"], 1)
        )
        t = batch.filter(keep)
        return pa.Table.from_pydict(
            {
                "prefix_md5": t["prefix_md5"],
                "n_docs": t["n_docs"].cast(pa.int64()),
                "n_texts": t["n_texts"].cast(pa.int64()),
                "keep_doc_id": t["keep_doc_id"].cast(pa.int64()),
            }
        )

    return per_prefix.map_batches(finish, batch_format="pyarrow")


def _pair_schema() -> pa.schema:
    return pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n", pa.int64())]
    )


def _tri_expand_pairs(bh: np.ndarray, d: np.ndarray) -> pa.Table:
    """Vectorized triangular pair expansion of equal-``bh`` runs (rows
    MUST be sorted by (bh, d)): every within-run (d_i, d_j), i<j, as one
    (doc_a, doc_b, 1) row — the basket_pairs machinery shared by the
    set-similarity join's interior blocks and its driver edge fold."""
    n = len(bh)
    empty = pa.Table.from_pydict(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        },
        schema=_pair_schema(),
    )
    if n < 2:
        return empty
    new_grp = np.r_[True, bh[1:] != bh[:-1]]
    gid = np.cumsum(new_grp) - 1
    sizes = np.bincount(gid)
    ends = np.cumsum(sizes) - 1
    r_e = ends[gid] - np.arange(n)  # partners after each row
    total = int(r_e.sum())
    if total == 0:
        return empty
    left = np.repeat(np.arange(n), r_e)
    starts = np.r_[0, np.cumsum(r_e)[:-1]]
    off = np.arange(total) - np.repeat(starts, r_e) + 1
    right = left + off
    da, db = d[left], d[right]
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array(np.minimum(da, db), type=pa.int64()),
            "doc_b": pa.array(np.maximum(da, db), type=pa.int64()),
            "n": pa.array(np.ones(total, dtype=np.int64), type=pa.int64()),
        },
        schema=_pair_schema(),
    )


def setjoin_jaccard(
    ds: ray.data.Dataset,
    tau_fp6: int = 500_000,
    mode: str = "cooccur",
    semi_join: bool | None = None,
    candidate_limit: int = 2_000_000,
    size_broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard_fp6) — EXACT set-similarity self-join:
    every document pair whose 3-gram-HASH Jaccard is >= tau, with NO
    recall loss — what [[minhash_candidates]] trades recall for and
    [[dedup_candidates_recall]] audits against. Shingle identity is the
    shared 60-bit base hash (collision odds ~|shingles|²/2^61).

    ``mode='cooccur'`` (default) is the fully-VECTORIZED plan: one
    global sort of the distinct (hash, doc) rows, triangular pair
    expansion of interior runs per block ([[_tri_expand_pairs]]) + a
    driver fold of the <= 2 boundary runs per block edge, ONE payload-
    free keyed_fold summing pair rows into exact intersection sizes,
    per-doc set sizes attached through two guarded [[keyed_attach_int]]
    probes, and a streaming fp6 filter. No per-pair Python anywhere —
    measured 13x faster than per-pair set verification at the bench
    tier (the 130µs/group groupby cost, the exchange.py finding). Pair-
    slot volume is Σ_buckets C(df, 2): fine whenever shingle DF is
    bounded (true for content n-grams), quadratic under boilerplate-
    shingle skew.

    ``mode='prefix'`` is the AllPairs/PPJoin prefix-filtered plan for
    exactly that adversarial regime (Bayardo et al. 2007; Xiao et al.
    2008): order the token universe by (global DF, hash) — any
    consistent TOTAL order is correct; rare-first minimizes buckets —
    and expand pairs only from each doc's first |d| − ceil(tau·|d|) + 1
    tokens. Prefix theorem: if J(A,B) >= tau, the smallest common token
    t must sit in BOTH prefixes (were it outside A's prefix, every
    common token would sit in A's last ceil(tau|A|)−1 positions,
    capping the overlap below ceil(tau|A|) <= |A∩B|; symmetric for B) —
    so the pair collides in t's bucket and candidates are a SUPERSET.
    Each candidate is then verified exactly through the shared
    [[_scored_candidate_pairs]] payload join. Common tokens land at the
    END of the DF order and drop out of large docs' prefixes, so the
    quadratic boilerplate buckets never expand. The two modes are
    asserted pair-for-pair equal in tests.

    Heavy-dup caveat (both modes): exact copies all join (a k-copy text
    is a k-clique of J=1.0 pairs) — compose with [[exact_dedup]]
    upstream at scale, the same reason minhash_candidates rep-collapses.

    Oracle: distinct hashed shingles per doc, co-hash pair counts, fp6
    Jaccard filter — identical rounding convention both sides."""
    from .exchange import keyed_fold
    from .relational import keyed_attach_int

    def explode(batch: pa.Table) -> pa.Table:
        out_h: list[int] = []
        out_d: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for h in {shingle_base_hash(s) for s in shingle_set(text)}:
                out_h.append(h)
                out_d.append(doc_id)
        return pa.Table.from_pydict(
            {
                "bh": pa.array(out_h, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "n": pa.array([1] * len(out_h), type=pa.int64()),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow").materialize()
    sizes = keyed_fold(
        rows.select_columns(["doc_id", "n"]), "doc_id", [("n", "sum")]
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        bh = batch["bh"].to_numpy(zero_copy_only=False)
        if len(bh) == 0:
            return pa.Table.from_pydict(
                {
                    "bh": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        edge = (bh == bh[0]) | (bh == bh[-1])
        return pa.Table.from_pydict(
            {
                "bh": pa.array(bh[edge], type=pa.int64()),
                "doc_id": pa.array(d[edge], type=pa.int64()),
            }
        )

    def interior_pairs_fn(batch: pa.Table) -> pa.Table:
        bh = batch["bh"].to_numpy(zero_copy_only=False)
        if len(bh) == 0:
            return _tri_expand_pairs(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            )
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        inner = (bh != bh[0]) & (bh != bh[-1])
        return _tri_expand_pairs(bh[inner], d[inner])

    def _pairs_from(sorted_rows: ray.data.Dataset) -> ray.data.Dataset:
        """Interior expansion per block + driver fold of boundary runs
        (<= 2 runs per block edge — the keyed_fold edge discipline)."""
        interior = sorted_rows.map_batches(
            interior_pairs_fn, batch_format="pyarrow"
        )
        eb = [
            b
            for b in sorted_rows.map_batches(
                edge_rows, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        if not eb:
            return interior
        et = pa.concat_tables(eb)
        ebh = et["bh"].to_numpy(zero_copy_only=False)
        ed = et["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ed, ebh))
        return interior.union(
            ray.data.from_arrow(_tri_expand_pairs(ebh[order], ed[order]))
        )

    if mode == "cooccur":
        sorted_rows = (
            rows.select_columns(["bh", "doc_id"])
            .sort(["bh", "doc_id"])
            .materialize()
        )
        inter = keyed_fold(
            _pairs_from(sorted_rows), ["doc_a", "doc_b"], [("n", "sum")]
        )

        def _sizes_as(key_name: str) -> ray.data.Dataset:
            return sizes.map_batches(
                lambda t, _k=key_name: pa.Table.from_pydict(
                    {_k: t["doc_id"], "n": t["n"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )

        with_a = keyed_attach_int(
            inter.map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "doc_a": t["doc_a"],
                        "doc_b": t["doc_b"],
                        "inter": t["n"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            _sizes_as("doc_a"),
            key="doc_a",
            val="n",
            payload=("doc_b", "inter"),
            broadcast_limit=size_broadcast_limit,
        )
        # keyed_attach_int outputs (key, val, *payload) = (doc_a, n, ...)
        with_ab = keyed_attach_int(
            with_a.map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "doc_b": t["doc_b"],
                        "doc_a": t["doc_a"],
                        "sz_a": t["n"].cast(pa.int64()),
                        "inter": t["inter"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            _sizes_as("doc_b"),
            key="doc_b",
            val="n",
            payload=("doc_a", "sz_a", "inter"),
            broadcast_limit=size_broadcast_limit,
        )

        def score_block(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from . import fp as _fp

            inter_v = batch["inter"].to_numpy(zero_copy_only=False)
            sz_a = batch["sz_a"].to_numpy(zero_copy_only=False)
            sz_b = batch["n"].to_numpy(zero_copy_only=False)
            uni = sz_a + sz_b - inter_v
            jac = np.floor(
                inter_v * 1_000_000.0 / np.maximum(uni, 1) + 0.5
            ).astype(np.int64)
            keep = (jac >= tau_fp6) & (uni > 0)
            return pa.Table.from_pydict(
                {
                    "doc_a": batch["doc_a"]
                    .combine_chunks()
                    .take(pa.array(np.flatnonzero(keep))),
                    "doc_b": batch["doc_b"]
                    .combine_chunks()
                    .take(pa.array(np.flatnonzero(keep))),
                    "jaccard_fp6": pa.array(jac[keep], type=pa.int64()),
                }
            )

        return with_ab.map_batches(score_block, batch_format="pyarrow")

    if mode != "prefix":
        raise ValueError(f"unknown mode {mode!r}")

    # ---- PPJoin prefix mode ------------------------------------------
    df = keyed_fold(rows, "bh", [("n", "sum")])
    with_df = keyed_attach_int(
        rows, df, key="bh", val="n", payload=("doc_id",)
    )

    def prefix(group: pa.Table) -> pa.Table:
        bh = group["bh"].to_numpy(zero_copy_only=False)
        dfv = group["n"].to_numpy(zero_copy_only=False)
        doc = int(group["doc_id"][0].as_py())
        g = len(bh)
        k = g - (tau_fp6 * g + 999_999) // 1_000_000 + 1
        order = np.lexsort((bh, dfv))[: max(k, 0)]
        return pa.Table.from_pydict(
            {
                "bh": pa.array(bh[order], type=pa.int64()),
                "doc_id": pa.array([doc] * len(order), type=pa.int64()),
            }
        )

    pref = (
        with_df.groupby("doc_id")
        .map_groups(prefix, batch_format="pyarrow")
        .sort(["bh", "doc_id"])
        .materialize()
    )
    cand = _pairs_from(pref)

    def payload(text: str) -> list[str]:
        return [
            str(h) for h in {shingle_base_hash(s) for s in shingle_set(text)}
        ]

    from . import fp

    def score(pl_a: list[str], pl_b: list[str]) -> int:
        sa, sb = set(pl_a), set(pl_b)
        uni = len(sa | sb)
        return fp(len(sa & sb) * 1000000.0 / uni, 0) if uni else 0

    scored = _scored_candidate_pairs(
        ds,
        payload_fn=payload,
        score_fn=score,
        score_name="jaccard_fp6",
        semi_join=semi_join,
        candidate_limit=candidate_limit,
        cand=cand,
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["jaccard_fp6"], tau_fp6))

    return scored.map_batches(keep, batch_format="pyarrow")


def dup_ngram_coverage(ds: ray.data.Dataset, w: int = 10) -> ray.data.Dataset:
    """(doc_id, n_windows, n_dup_windows, dup_ppm) — the Lee-et-al-style
    memorization-risk audit: what fraction of each document's sliding
    ``w``-token windows (stride 1, whitespace tokens) also occurs in at
    least one OTHER document. dup_ppm = n_dup_windows·10⁶ // n_windows;
    docs shorter than ``w`` tokens emit nothing (mirrored in the oracle's
    ``len(w) >= 10`` gate). The per-document dual of [[winnow_density]]:
    winnowing samples fingerprints, this counts full window coverage —
    the decontamination/memorization number a release datasheet quotes.

    Shape: ONE tokenize pass emits per-(doc, window-hash) count rows
    (docs are rows, so the (doc, h) rows are globally distinct without a
    dedup shuffle) → [[keyed_fold]] per hash for the distinct-doc count →
    the shared [[keyed_attach_int]] guarded broadcast / tagged-union
    attach of ndocs back onto the (h, doc, cnt) rows → one per-doc keyed
    sum. Text never rides a shuffle; 60-bit hash collisions overcount
    dup windows at ~n²/2⁶¹ (the [[dedup_exact]] contract, hash mirrored
    bit-exactly in SQL)."""
    from .exchange import keyed_fold
    from .relational import keyed_attach_int
    from .textstats import ascii_tokens

    def win_partial(batch: pa.Table) -> pa.Table:
        hs: list[int] = []
        ds_: list[int] = []
        cs: list[int] = []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = ascii_tokens(t)
            if len(toks) < w:
                continue
            counts: dict = {}
            for i in range(len(toks) - w + 1):
                h = shingle_base_hash(" ".join(toks[i : i + w]))
                counts[h] = counts.get(h, 0) + 1
            for h, c in counts.items():
                hs.append(h)
                ds_.append(int(did))
                cs.append(c)
        return pa.Table.from_pydict(
            {
                "h": pa.array(hs, type=pa.int64()),
                "doc_id": pa.array(ds_, type=pa.int64()),
                "cnt": pa.array(cs, type=pa.int64()),
            }
        )

    fact = ds.map_batches(win_partial, batch_format="pyarrow").materialize()
    dim = keyed_fold(
        fact.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "h": b["h"],
                    "ndocs": pa.array(
                        np.ones(b.num_rows, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        "h",
        [("ndocs", "sum")],
    )
    att = keyed_attach_int(fact, dim, "h", "ndocs", ("doc_id", "cnt"))

    def per_doc(batch: pa.Table) -> pa.Table:
        nd = batch["ndocs"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "tot": pa.array(c, type=pa.int64()),
                "dup": pa.array(
                    np.where(nd >= 2, c, 0), type=pa.int64()
                ),
            }
        )

    agg = keyed_fold(
        att.map_batches(per_doc, batch_format="pyarrow"),
        "doc_id",
        [("tot", "sum"), ("dup", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["tot"].to_numpy(zero_copy_only=False)
        dup = batch["dup"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_windows": pa.array(tot, type=pa.int64()),
                "n_dup_windows": pa.array(dup, type=pa.int64()),
                "dup_ppm": pa.array(
                    dup * 1_000_000 // tot, type=pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def window_dedup(
    ds: ray.data.Dataset, window: int = 100, prefix_tokens: int = 16
) -> ray.data.Dataset:
    """(doc_id, prev_doc_id, gap) — prefix-duplicate re-occurrences
    within a sliding window of the previous ``window`` documents of the
    ingest stream (position = rank by doc_id; key = md5 of the first
    ``prefix_tokens`` whitespace tokens, the [[truncation_dups]] prefix
    family): the streaming dedup gate an ingest pipeline applies before
    anything global — crawler republish bursts and feed hiccups produce
    near-adjacent copies/truncations that a bounded window catches with
    O(window) state, long before the global [[dedup_exact]] pass runs.
    Each re-occurrence pairs with its IMMEDIATE previous occurrence
    (consecutive-occurrence semantics, LAG in the oracle).

    Scale shape: the prefix is md5-collapsed per block BEFORE anything
    moves, so only (doc_id, hash) rows ride; ONE global doc_id sort +
    block-offset ranks ([[global_row_number]] — driver state
    O(#blocks)); then ONE keyed prefix-hash groupby where consecutive
    gaps are a vectorized np.diff per group. At 10^12 docs the window
    semantics shard cleanly by rank-range with ``window``-row boundary
    overlap."""
    from .exchange import global_row_number
    from .textstats import ascii_tokens

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "text_md5": pa.array(
                    [
                        _md5(" ".join(ascii_tokens(t)[:prefix_tokens]))
                        for t in batch["text"].to_pylist()
                    ],
                    type=pa.string(),
                ),
            }
        )

    ranked = global_row_number(
        ds.map_batches(hash_batch, batch_format="pyarrow"),
        ["doc_id"],
    )

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("prev_doc_id", pa.int64()),
            ("gap", pa.int64()),
        ]
    )

    def gaps(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.Table.from_pydict(
                {"doc_id": [], "prev_doc_id": [], "gap": []},
                schema=OUT_SCHEMA,
            )
        order = np.argsort(group["r"].to_numpy(zero_copy_only=False))
        r = group["r"].to_numpy(zero_copy_only=False)[order]
        ids = group["doc_id"].to_numpy(zero_copy_only=False)[order]
        g = np.diff(r)
        keep = g <= window
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[1:][keep], type=pa.int64()),
                "prev_doc_id": pa.array(ids[:-1][keep], type=pa.int64()),
                "gap": pa.array(g[keep], type=pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    return ranked.groupby("text_md5").map_groups(
        gaps, batch_format="pyarrow"
    )
