"""Interleaved-span operators — the graft cell's payload axis.

These run over the BASELINE.json input_hint table itself:
``(doc_id: string, spans: list<struct<kind:string, text:string,
media_ref:string, offset:int32>>)`` — the Lance-shaped interleaved
text+media corpus the extraction pipeline consumes. Where the extraction
flagship turns the spans into rasters and back, these operators treat the
interleave STRUCTURE as data: per-document modality profiles, media→caption
pairing, and a deterministic flat rendering — the catalog / curation passes
a 10¹²-doc interleaved corpus needs before any pixel is decoded.

All three are pure per-document maps (1→1 or 1→N fan-out inside
map_batches): no shuffle, no driver state, the spans column is consumed
zero-copy via ``pyarrow.compute`` list kernels (list_flatten /
list_parent_indices) + numpy lexsort — never a Python loop over spans.

Scale note: the only per-doc ordering needed is BY OFFSET WITHIN a doc, so
every kernel is block-local; blocks scale horizontally with no repartition
requirement. Output blocks are re-chunked by the streaming executor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _flat_spans(batch: pa.Table, sort: bool = True):
    """(doc_ids, parent, order, kind_sorted..., helpers) shared unpack.

    Returns the batch's span structs flattened and (when ``sort``)
    offset-sorted within each parent document:
      ids      — doc_id value per FLAT span row (Arrow, batch order)
      parent   — int64 np array: batch-row index per flat span
      order    — np argsort indices: (parent, offset) lexsort, or None
                 when the caller's aggregation is order-independent
      n_docs   — batch row count
      fields   — dict of flat child arrays (kind/text/media_ref/offset)

    Contract note: docs whose spans list is EMPTY contribute no flat rows;
    operators that emit one row per doc filter those out so their output
    matches the UNNEST-based oracles (which also omit empty docs). A
    zero-span doc is detectable upstream as input_rows != output_rows.
    """
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    fields = {
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    order = None
    if sort:
        off = fields["offset"].to_numpy(zero_copy_only=False)
        order = np.lexsort((off, parent))
    ids = batch.column("doc_id")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return ids, parent, order, batch.num_rows, fields


def _keep_nonempty(table: pa.Table, n_spans: np.ndarray) -> pa.Table:
    """Drop per-doc output rows for zero-span docs (oracle parity — see
    _flat_spans contract note); no-op on corpora where every doc has
    spans."""
    if (n_spans > 0).all():
        return table
    return table.filter(pa.array(n_spans > 0))


def span_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document interleave profile: (doc_id, n_spans, n_text, n_media,
    n_chars, n_tt, n_tm, n_mt, n_mm).

    n_chars = total code points across text spans; n_xy = count of
    offset-adjacent span-kind transitions x→y (t=text, m=media) — the
    modality-structure fingerprint used to stratify an interleaved corpus
    (text-only vs image-heavy vs caption-alternating docs) before routing
    docs to modality-specific pipelines. Pure per-doc map, no shuffle."""

    def profile(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        is_media = pc.equal(f["kind"], "media").to_numpy(zero_copy_only=False)
        n_spans = np.bincount(parent, minlength=n_docs)
        n_media = np.bincount(parent[is_media], minlength=n_docs)
        chars = pc.utf8_length(f["text"]).to_numpy(zero_copy_only=False)
        n_chars = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_chars, parent[~is_media], chars[~is_media])
        # Transitions over the offset-sorted flat view: adjacent flat rows
        # with the same parent are consecutive spans of one document.
        p_s = parent[order]
        m_s = is_media[order]
        adj = p_s[1:] == p_s[:-1]
        out = {
            "doc_id": ids,
            "n_spans": pa.array(n_spans, type=pa.int64()),
            "n_text": pa.array(n_spans - n_media, type=pa.int64()),
            "n_media": pa.array(n_media, type=pa.int64()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
        for name, mask in (
            ("n_tt", ~m_s[:-1] & ~m_s[1:]),
            ("n_tm", ~m_s[:-1] & m_s[1:]),
            ("n_mt", m_s[:-1] & ~m_s[1:]),
            ("n_mm", m_s[:-1] & m_s[1:]),
        ):
            cnt = np.bincount(p_s[1:][adj & mask], minlength=n_docs)
            out[name] = pa.array(cnt, type=pa.int64())
        return _keep_nonempty(pa.Table.from_pydict(out), n_spans)

    return ds.map_batches(profile, batch_format="pyarrow")


def media_captions(ds: ray.data.Dataset, max_chars: int = 40) -> ray.data.Dataset:
    """(doc_id, media_ref, span_offset, caption) — one row per MEDIA span;
    caption = the first ``max_chars`` code points of the immediately
    FOLLOWING span's text when that span is a text span (the caption
    heuristic interleaved image-text corpora use to build alt-text /
    CLIP-style pairs), else ''. 1→N fan-out per doc, no shuffle; the
    truncation is ``utf8_slice_codeunits`` — verified code-point-equal to
    Python ``t[:k]`` and DuckDB ``substr`` on Cyrillic."""

    def pair(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        n = len(parent)
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=batch.column("doc_id").type),
                    "media_ref": pa.array([], type=pa.string()),
                    "span_offset": pa.array([], type=pa.int64()),
                    "caption": pa.array([], type=pa.string()),
                }
            )
        order_arr = pa.array(order)
        kind_s = f["kind"].take(order_arr)
        text_s = f["text"].take(order_arr)
        ref_s = f["media_ref"].take(order_arr)
        off_s = f["offset"].take(order_arr)
        p_s = parent[order]
        is_media_s = pc.equal(kind_s, "media").to_numpy(zero_copy_only=False)
        # Next-span text, shifted within the sorted view; last row and
        # cross-document boundaries get no caption.
        nxt = pa.array(np.minimum(np.arange(n) + 1, n - 1))
        next_text = text_s.take(nxt)
        next_is_text = pc.equal(kind_s.take(nxt), "text").to_numpy(
            zero_copy_only=False
        )
        same_doc = np.zeros(n, dtype=bool)
        same_doc[:-1] = p_s[1:] == p_s[:-1]
        has_cap = is_media_s & same_doc & next_is_text
        cap = pc.if_else(pa.array(has_cap), next_text, "")
        cap = pc.utf8_slice_codeunits(cap, 0, max_chars)
        media_pos = np.flatnonzero(is_media_s)
        take_m = pa.array(media_pos)
        return pa.Table.from_pydict(
            {
                "doc_id": ids.take(pa.array(p_s[media_pos])),
                "media_ref": ref_s.take(take_m),
                "span_offset": pc.cast(off_s.take(take_m), pa.int64()),
                "caption": cap.take(take_m),
            }
        )

    return ds.map_batches(pair, batch_format="pyarrow")


def render_interleaved(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, rendered, n_chars) — the deterministic flat rendering of an
    interleaved doc: spans in offset order, text spans verbatim, media
    spans as ``[IMG:<media_ref>]`` placeholders, newline-joined — the
    "document as one training string" view (multimodal-LLM corpora store
    exactly this interleave contract; the placeholder is where a vision
    embedding is spliced at training time). Per-doc map, no shuffle; the
    join is an Arrow list binary_join over the offset-sorted pieces."""

    def render(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        is_media = pc.equal(f["kind"], "media")
        placeholder = pc.binary_join_element_wise(
            pa.scalar("[IMG:"), f["media_ref"], pa.scalar("]"), pa.scalar("")
        )
        pieces = pc.if_else(is_media, placeholder, f["text"])
        pieces_s = pieces.take(pa.array(order))
        counts = np.bincount(parent, minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pieces_s)
        rendered = pc.binary_join(lists, "\n")
        return _keep_nonempty(
            pa.Table.from_pydict(
                {
                    "doc_id": ids,
                    "rendered": rendered,
                    "n_chars": pc.cast(pc.utf8_length(rendered), pa.int64()),
                }
            ),
            counts,
        )

    return ds.map_batches(render, batch_format="pyarrow")


def span_integrity(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_spans, n_gaps, n_dup_offsets, n_empty_text,
    n_media_with_text, starts_at_zero, ok) — the data-quality gate for an
    interleaved spans table (the deequ-style contract check BEFORE the
    extraction pipeline trusts its input): offsets must be dense from 0
    (no gaps, no duplicates), text spans must carry text, media spans must
    not. A 10¹²-doc ingest runs this after every crawl merge; `ok=false`
    rows route to quarantine. Pure per-doc map over the offset-sorted flat
    view — same zero-copy kernels as span_stats, no shuffle."""

    def check(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        is_media = pc.equal(f["kind"], "media").to_numpy(zero_copy_only=False)
        text_len = pc.utf8_length(f["text"]).to_numpy(zero_copy_only=False)
        off = f["offset"].to_numpy(zero_copy_only=False)
        n_spans = np.bincount(parent, minlength=n_docs)
        empty_text = (~is_media) & (text_len == 0)
        media_text = is_media & (text_len > 0)
        n_empty = np.bincount(parent[empty_text], minlength=n_docs)
        n_mediatext = np.bincount(parent[media_text], minlength=n_docs)
        # offset shape over the sorted flat view
        p_s, o_s = parent[order], off[order]
        adj = p_s[1:] == p_s[:-1]
        d = o_s[1:] - o_s[:-1]
        n_gaps = np.bincount(p_s[1:][adj & (d > 1)], minlength=n_docs)
        n_dups = np.bincount(p_s[1:][adj & (d == 0)], minlength=n_docs)
        # first sorted offset per doc == 0 (docs with no spans fail)
        starts0 = np.zeros(n_docs, dtype=bool)
        first_pos = np.unique(p_s, return_index=True)
        starts0[first_pos[0]] = o_s[first_pos[1]] == 0
        ok = (
            (n_gaps == 0)
            & (n_dups == 0)
            & (n_empty == 0)
            & (n_mediatext == 0)
            & starts0
        )
        return _keep_nonempty(
            pa.Table.from_pydict(
                {
                    "doc_id": ids,
                    "n_spans": pa.array(n_spans, type=pa.int64()),
                    "n_gaps": pa.array(n_gaps, type=pa.int64()),
                    "n_dup_offsets": pa.array(n_dups, type=pa.int64()),
                    "n_empty_text": pa.array(n_empty, type=pa.int64()),
                    "n_media_with_text": pa.array(n_mediatext, type=pa.int64()),
                    "starts_at_zero": pa.array(starts0),
                    "ok": pa.array(ok),
                }
            ),
            n_spans,
        )

    return ds.map_batches(check, batch_format="pyarrow")


def interleave_pack(
    ds: ray.data.Dataset,
    capacity: int = 512,
    vision_tokens: int = 64,
    shard_size: int = 64,
) -> ray.data.Dataset:
    """(shard, doc_id, cost_tokens, seq_no, offset_tokens) — MULTIMODAL
    sequence packing: greedy next-fit of interleaved documents into
    fixed-capacity training sequences where a text span costs its
    whitespace-token count and a media span costs a FIXED
    ``vision_tokens`` budget (the patch-token count a vision encoder
    contributes per image — how interleaved-VLM batches are actually
    laid out). Same sharded next-fit contract as ``pack_sequences``
    (textstats.py): packing within fixed doc shards (numeric doc index
    // shard_size, docs in index order), because the global greedy fold
    is unsummarizable per block while per-shard packing is
    embarrassingly parallel and deterministic under repartitioning.

    Scale shape: span costs are computed in-scan (vectorized
    count_substring_regex — the text itself never leaves the scan);
    only (shard, idx, cost) int rows ride the ONE shard keyed groupby."""

    def cost(batch: pa.Table) -> pa.Table:
        # order-independent aggregation: skip _flat_spans' lexsort
        ids, parent, _order, n_docs, f = _flat_spans(batch, sort=False)
        is_media = pc.equal(f["kind"], "media").to_numpy(zero_copy_only=False)
        ntok = pc.count_substring_regex(
            f["text"], r"[^ \t\n\r\v\f]+"
        ).to_numpy(zero_copy_only=False)
        span_cost = np.where(is_media, vision_tokens, ntok).astype(np.int64)
        doc_cost = np.zeros(n_docs, dtype=np.int64)
        np.add.at(doc_cost, parent, span_cost)
        n_spans = np.bincount(parent, minlength=n_docs)
        # numeric index = everything after the 'doc-' prefix (unbounded
        # slice: 'doc-%06d' grows past 6 digits above 10^6 docs)
        idx = pc.cast(pc.utf8_slice_codeunits(ids, 4, 2**30), pa.int64())
        return _keep_nonempty(
            pa.Table.from_pydict(
                {
                    "shard": pc.divide(
                        idx, pa.scalar(shard_size, type=pa.int64())
                    ),
                    "idx": idx,
                    "doc_id": ids,
                    "cost_tokens": pa.array(doc_cost, type=pa.int64()),
                }
            ),
            n_spans,
        )

    OUT_SCHEMA = pa.schema(
        [
            ("shard", pa.int64()),
            ("doc_id", pa.string()),
            ("cost_tokens", pa.int64()),
            ("seq_no", pa.int64()),
            ("offset_tokens", pa.int64()),
        ]
    )

    def pack(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["idx"])
        out = []
        seq_no, fill = 0, 0
        for i, r in enumerate(rows):
            if i > 0 and fill + r["cost_tokens"] > capacity:
                seq_no += 1
                fill = 0
            out.append(
                {
                    "shard": r["shard"],
                    "doc_id": r["doc_id"],
                    "cost_tokens": r["cost_tokens"],
                    "seq_no": seq_no,
                    "offset_tokens": fill,
                }
            )
            fill += r["cost_tokens"]
        return pa.Table.from_pylist(out, schema=OUT_SCHEMA)

    return (
        ds.map_batches(cost, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )


def span_boilerplate(ds: ray.data.Dataset, max_docs: int = 16) -> ray.data.Dataset:
    """(doc_id, offset, kind, text, media_ref) — surviving spans after
    CROSS-DOCUMENT span-level boilerplate removal: ALL copies of any text
    span whose exact text occurs in more than ``max_docs`` distinct
    documents are dropped — the interleaved-table form of the CCNet/onion
    line-dedup pass (nav menus, footers, cookie banners arrive as whole
    spans from the HTML segmenter). Media spans and empty text spans
    always survive (they are structure, not prose).

    Scale shape: ONE keyed shuffle on the span-text 60-bit hash, text
    rides once; media/empty spans join the same shuffle under a
    per-span unique hash (tag=0 — emitted unconditionally) so the input
    scans ONCE. In each hash group the distinct-doc count decides drop
    vs keep in place — no marks pass, no doc rebuild (output is flat).
    """
    from .dedup import shingle_base_hash

    def explode(batch: pa.Table) -> pa.Table:
        ids, parent, _order, n_docs, f = _flat_spans(batch, sort=False)
        kind = f["kind"]
        text = f["text"]
        is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        nonempty = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False) > 0
        )
        gated = is_text & nonempty
        doc_ids = ids.take(pa.array(parent))
        texts = text.to_pylist()
        dids = doc_ids.to_pylist()
        offs = f["offset"].to_numpy(zero_copy_only=False)
        # one md5 per DISTINCT text (Counter trick); bypass rows get a
        # per-span unique hash so they spread across the same shuffle
        cache: dict[str, int] = {}
        hs = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if gated[i]:
                h = cache.get(t)
                if h is None:
                    h = cache[t] = shingle_base_hash(t)
                hs[i] = h
            else:
                hs[i] = shingle_base_hash(f"{dids[i]}:{offs[i]}")
        return pa.Table.from_pydict(
            {
                "h": pa.array(hs, type=pa.int64()),
                "tag": pa.array(gated.astype(np.int8), type=pa.int8()),
                "doc_id": doc_ids,
                "offset": pc.cast(f["offset"], pa.int64()),
                "kind": kind,
                "text": text,
                "media_ref": f["media_ref"],
            }
        )

    OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.string()),
            ("offset", pa.int64()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
        ]
    )

    def gate(group: pa.Table) -> pa.Table:
        tag = group["tag"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(tag), dtype=bool)
        text_rows = tag == 1
        if text_rows.any():
            docs = group["doc_id"].to_pylist()
            nd = len({docs[i] for i in np.flatnonzero(text_rows)})
            if nd > max_docs:
                keep &= ~text_rows
        if not keep.any():
            return OUT_SCHEMA.empty_table()
        out = group.filter(pa.array(keep))
        return out.select(["doc_id", "offset", "kind", "text", "media_ref"])

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("h")
        .map_groups(gate, batch_format="pyarrow")
    )


def curate_captions(
    spans_ds: ray.data.Dataset,
    media_ds: ray.data.Dataset,
    max_chars: int = 40,
) -> ray.data.Dataset:
    """(canonical_ref, n_candidates, caption) — the CLIP-pair builder:
    for every CANONICAL media payload (exact content dedup collapses
    re-embedded copies), the best caption across all docs that embed any
    copy — best = longest, ties by (doc_id, span_offset) ascending. The
    cross-table composition pipeline for interleaved corpora: spans give
    captions, the media store gives content identity, training gets one
    (image, text) pair per distinct payload.

    Scale shape: media_captions is a per-doc map; media_content_dedup is
    one keyed md5 groupby of (hash, ref) pairs; the composition adds ONE
    media_ref tagged-union shuffle (captions meet their canonical ref)
    and ONE tiny canonical_ref groupby for the pick. Payload bytes never
    leave the hashing scan; caption strings ride each shuffle once."""
    from .multimodal import media_content_dedup

    caps = media_captions(spans_ds, max_chars=max_chars)
    dd = media_content_dedup(media_ds)

    U_SCHEMA = pa.schema(
        [
            ("media_ref", pa.string()),
            ("tag", pa.int8()),
            ("canonical_ref", pa.string()),
            ("caption", pa.string()),
            ("doc_id", pa.string()),
            ("span_offset", pa.int64()),
        ]
    )

    def tag_caps(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"],
                "tag": pa.array([1] * n, type=pa.int8()),
                "canonical_ref": pa.array([""] * n, type=pa.string()),
                "caption": batch["caption"],
                "doc_id": batch["doc_id"],
                "span_offset": batch["span_offset"].cast(pa.int64()),
            },
            schema=U_SCHEMA,
        )

    def tag_dd(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"],
                "tag": pa.array([0] * n, type=pa.int8()),
                "canonical_ref": batch["canonical_ref"],
                "caption": pa.array([""] * n, type=pa.string()),
                "doc_id": pa.array([""] * n, type=pa.string()),
                "span_offset": pa.array([-1] * n, type=pa.int64()),
            },
            schema=U_SCHEMA,
        )

    ATT_SCHEMA = pa.schema(
        [
            ("canonical_ref", pa.string()),
            ("caption", pa.string()),
            ("doc_id", pa.string()),
            ("span_offset", pa.int64()),
        ]
    )

    OUT_SCHEMA = pa.schema(
        [
            ("canonical_ref", pa.string()),
            ("n_candidates", pa.int64()),
            ("caption", pa.string()),
        ]
    )

    merged = caps.map_batches(tag_caps, batch_format="pyarrow").union(
        dd.map_batches(tag_dd, batch_format="pyarrow")
    )

    # ---- stage 1: attach canonical refs to captions --------------------
    # ONE sort by (media_ref, tag) replaces a 60k-group map_groups: each
    # sorted block resolves its INTERIOR keys fully vectorized (the
    # tag-0 dedup row sorts first in its group and broadcasts to the
    # group's tag-1 caption rows by group-start fancy indexing); only
    # the <= 2 keys touching each block edge fold on the driver.
    sorted_m = (
        merged.repartition(16).sort(["media_ref", "tag"]).materialize()
    )

    def attach_interior(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return ATT_SCHEMA.empty_table()
        ref = np.asarray(batch["media_ref"].to_pylist(), dtype=object)
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        canon = np.asarray(
            batch["canonical_ref"].to_pylist(), dtype=object
        )
        inner = (ref != ref[0]) & (ref != ref[-1])
        new_grp = np.r_[True, ref[1:] != ref[:-1]]
        gs_idx = np.flatnonzero(new_grp)
        gid = np.cumsum(new_grp) - 1
        gs = gs_idx[gid]
        sel = inner & (tag == 1) & (tag[gs] == 0)
        idx = np.flatnonzero(sel)
        return pa.Table.from_pydict(
            {
                "canonical_ref": pa.array(
                    canon[gs[idx]], type=pa.string()
                ),
                "caption": batch["caption"].take(pa.array(idx)),
                "doc_id": batch["doc_id"].take(pa.array(idx)),
                "span_offset": batch["span_offset"].take(pa.array(idx)),
            },
            schema=ATT_SCHEMA,
        )

    def edge_rows(key: str):
        def f(batch: pa.Table) -> pa.Table:
            col = np.asarray(batch[key].to_pylist(), dtype=object)
            if len(col) == 0:
                return batch
            return batch.filter(
                pa.array((col == col[0]) | (col == col[-1]))
            )

        return f

    interior_att = sorted_m.map_batches(
        attach_interior, batch_format="pyarrow"
    )
    brows = sorted_m.map_batches(
        edge_rows("media_ref"), batch_format="pyarrow"
    ).take_all()  # O(2 x #blocks) keys; groups are caption-fanout-sized
    by_ref: dict[str, dict] = {}
    for r in brows:
        g = by_ref.setdefault(r["media_ref"], {"canon": None, "caps": []})
        if r["tag"] == 0:
            g["canon"] = r["canonical_ref"]
        else:
            g["caps"].append(r)
    b_att = [
        {
            "canonical_ref": g["canon"],
            "caption": r["caption"],
            "doc_id": r["doc_id"],
            "span_offset": r["span_offset"],
        }
        for g in by_ref.values()
        if g["canon"] is not None
        for r in g["caps"]
    ]
    att = interior_att.union(
        ray.data.from_arrow(
            pa.Table.from_pylist(b_att, schema=ATT_SCHEMA)
        )
    )

    # ---- stage 2: pick the best caption per canonical payload ----------
    # same sort-based shape keyed by canonical_ref; best = (longest,
    # doc_id, span_offset) via one in-block lexsort over code keys.
    sorted_a = att.repartition(16).sort("canonical_ref").materialize()

    def pick_interior(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return OUT_SCHEMA.empty_table()
        canon = np.asarray(
            batch["canonical_ref"].to_pylist(), dtype=object
        )
        inner = (canon != canon[0]) & (canon != canon[-1])
        lens = pc.utf8_length(batch["caption"]).to_numpy(
            zero_copy_only=False
        )
        doc = np.asarray(batch["doc_id"].to_pylist(), dtype=str)
        off = batch["span_offset"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(canon, return_inverse=True)
        order = np.lexsort((off, doc, -lens, codes))
        c_s = codes[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        winners = order[first]
        winners = winners[inner[winners]]
        counts = np.bincount(codes)
        return pa.Table.from_pydict(
            {
                "canonical_ref": pa.array(
                    canon[winners], type=pa.string()
                ),
                "n_candidates": pa.array(
                    counts[codes[winners]], type=pa.int64()
                ),
                "caption": batch["caption"].take(pa.array(winners)),
            },
            schema=OUT_SCHEMA,
        )

    interior_out = sorted_a.map_batches(
        pick_interior, batch_format="pyarrow"
    )
    prows = sorted_a.map_batches(
        edge_rows("canonical_ref"), batch_format="pyarrow"
    ).take_all()
    by_canon: dict[str, list] = {}
    for r in prows:
        by_canon.setdefault(r["canonical_ref"], []).append(r)
    b_out = []
    for c, rows in by_canon.items():
        rows.sort(
            key=lambda r: (-len(r["caption"]), r["doc_id"], r["span_offset"])
        )
        b_out.append(
            {
                "canonical_ref": c,
                "n_candidates": len(rows),
                "caption": rows[0]["caption"],
            }
        )
    return interior_out.union(
        ray.data.from_arrow(pa.Table.from_pylist(b_out, schema=OUT_SCHEMA))
    )


def interleave_shape_hist(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(n_text, n_media, n_docs) — corpus-level histogram of interleave
    SHAPES: how many documents have exactly (n_text text spans, n_media
    media spans). The catalog pass that tells a 10¹²-doc curation run
    what modality mixes exist before any decode is scheduled.

    Shape: per-block np.bincount over parent indices (order-independent —
    no offset sort) → per-block shape partials → ONE keyed groupby on
    the packed (n_text << 20 | n_media) key; the span-count domain is
    bounded by max spans per doc, so the exchange is tiny. Zero-span
    docs are dropped (the _flat_spans contract — UNNEST oracles don't
    see them).

    Oracle: UNNEST + per-doc conditional counts + GROUP BY pair."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _ids, parent, _order, n_docs, fields = _flat_spans(
            batch, sort=False
        )
        is_text = (
            pc.equal(fields["kind"], "text")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_text = np.bincount(parent, weights=is_text, minlength=n_docs)
        n_total = np.bincount(parent, minlength=n_docs)
        n_text = n_text.astype(np.int64)
        n_media = (n_total - n_text).astype(np.int64)
        keep = n_total > 0
        packed = (n_text[keep] << 20) | n_media[keep]
        keys, counts = np.unique(packed, return_counts=True)
        return pa.Table.from_pydict(
            {
                "packed": pa.array(keys, type=pa.int64()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("packed")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        packed = batch["packed"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n_text": pa.array(packed >> 20, type=pa.int64()),
                "n_media": pa.array(packed & ((1 << 20) - 1), type=pa.int64()),
                "n_docs": batch["n_docs"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def media_ref_fanout(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(media_ref, n_docs, n_refs) — cross-document media reuse catalog:
    how many documents reference each media asset, and how many times in
    total. The sibling of media_content_dedup that needs no payload —
    the dedup planner's first pass at 10¹² docs, pure span metadata.

    Shape: per-block distinct (media_ref, doc_id) pairs with per-pair
    ref counts → keyed groupby on (media_ref, doc_id) Sum (exact
    cross-block doc dedup) → per-block re-partials → ONE keyed
    media_ref groupby (n_docs = row count, n_refs = Sum). Two keyed
    exchanges, both payload-free int/ref-string rows.

    Oracle: UNNEST → COUNT(*) / COUNT(DISTINCT doc_id) per ref."""
    from ray.data.aggregate import Sum

    def pair_partials(batch: pa.Table) -> pa.Table:
        ids, parent, _order, _n, fields = _flat_spans(batch, sort=False)
        is_media = pc.not_equal(fields["kind"], "text").to_numpy(
            zero_copy_only=False
        )
        refs = fields["media_ref"]
        doc_per_span = ids.take(pa.array(parent))
        t = pa.Table.from_pydict(
            {
                "media_ref": refs,
                "doc_id": doc_per_span,
                "n_refs": pa.array(
                    np.ones(len(parent), dtype=np.int64), type=pa.int64()
                ),
            }
        ).filter(pa.array(is_media))
        g = t.group_by(["media_ref", "doc_id"]).aggregate([("n_refs", "sum")])
        return g.rename_columns(["media_ref", "doc_id", "n_refs"])

    # (media_ref, doc_id) pairs are near-distinct — sort + run-length
    # fold, not groupby (per-group Python cost; see functions/exchange.py)
    from .exchange import keyed_sum

    per_pair = keyed_sum(
        ds.map_batches(pair_partials, batch_format="pyarrow"),
        ["media_ref", "doc_id"],
        "n_refs",
    )

    def ref_partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"],
                "n_docs": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64), type=pa.int64()
                ),
                "n_refs": batch["n_refs"].cast(pa.int64()),
            }
        )
        g = t.group_by(["media_ref"]).aggregate(
            [("n_docs", "sum"), ("n_refs", "sum")]
        )
        return g.rename_columns(["media_ref", "n_docs", "n_refs"])

    from .exchange import keyed_fold

    agg = keyed_fold(
        per_pair.map_batches(ref_partials, batch_format="pyarrow"),
        "media_ref",
        [("n_docs", "sum"), ("n_refs", "sum")],
    )

    def cast_cols(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"],
                "n_docs": batch["n_docs"].cast(pa.int64()),
                "n_refs": batch["n_refs"].cast(pa.int64()),
            }
        )

    return agg.map_batches(cast_cols, batch_format="pyarrow")


def span_length_profile(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(kind, bucket, n_spans) — corpus-wide span-length histogram per
    modality: text spans bucket by character length (0, 1-15, 16-63,
    64-255, 256+ → buckets 0..4 by bit_length thresholds), media spans
    all land in bucket 0 (no text payload). The pre-pack size census a
    sequence-packing run reads before choosing its block budget.

    Shape: per-block flat-span bucketing (vectorized digitize) →
    per-block (kind, bucket) partials → ONE keyed sum over the bounded
    (2 kinds × 5 buckets) domain.

    Oracle: UNNEST + the same CASE thresholds."""
    from ray.data.aggregate import Sum

    EDGES = np.array([1, 16, 64, 256], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        _ids, _parent, _order, _n, fields = _flat_spans(batch, sort=False)
        lens = pc.utf8_length(fields["text"]).to_numpy(zero_copy_only=False)
        kinds = fields["kind"]
        bucket = np.digitize(lens, EDGES).astype(np.int64)
        t = pa.Table.from_pydict(
            {
                "kind": kinds,
                "bucket": pa.array(bucket, type=pa.int64()),
                "n_spans": pa.array(
                    np.ones(len(bucket), dtype=np.int64), type=pa.int64()
                ),
            }
        )
        g = t.group_by(["kind", "bucket"]).aggregate([("n_spans", "sum")])
        return g.rename_columns(["kind", "bucket", "n_spans"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "bucket"])
        .aggregate(Sum("n_spans", alias_name="n_spans"))
    )

    def cast_cols(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "kind": batch["kind"],
                "bucket": batch["bucket"].cast(pa.int64()),
                "n_spans": batch["n_spans"].cast(pa.int64()),
            }
        )

    return agg.map_batches(cast_cols, batch_format="pyarrow")


def span_coalesce(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Reflow: merge every maximal run of offset-adjacent TEXT spans into
    one span (texts joined with a single space); media spans never merge.
    Emits the flattened result — (doc_id, offset, kind, text, media_ref,
    n_merged) with offsets renumbered 0..runs-1 per document — the
    compaction pass an interleaved corpus runs before tokenization so
    downstream char/token budgets see documents, not fragmentation.

    Pure per-doc block-local map: run boundaries come from one vectorized
    compare over the offset-sorted flat view, and the per-run text join is
    ``pc.binary_join`` over a runs-shaped ListArray (runs are contiguous
    after the lexsort) — no Python loop over spans, no shuffle.

    Oracle: window-function islands (lag ≠ kind ∨ kind='media') +
    string_agg ORDER BY offset."""

    def coalesce(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        n = len(parent)
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "offset": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.string()),
                    "text": pa.array([], type=pa.string()),
                    "media_ref": pa.array([], type=pa.string()),
                    "n_merged": pa.array([], type=pa.int64()),
                }
            )
        p_s = parent[order]
        kind_s = f["kind"].take(pa.array(order))
        text_s = f["text"].take(pa.array(order))
        ref_s = f["media_ref"].take(pa.array(order))
        is_media = pc.equal(kind_s, "media").to_numpy(zero_copy_only=False)
        boundary = np.ones(n, dtype=bool)
        boundary[1:] = (
            (p_s[1:] != p_s[:-1])
            | (is_media[1:] != is_media[:-1])
            | is_media[1:]
        )
        starts = np.flatnonzero(boundary)
        run_offsets = np.append(starts, n).astype(np.int32)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(run_offsets), text_s), " "
        )
        run_parent = p_s[starts]
        # per-doc run rank: run index minus the doc's first run index
        first_run = np.ones(len(starts), dtype=bool)
        first_run[1:] = run_parent[1:] != run_parent[:-1]
        run_idx = np.arange(len(starts), dtype=np.int64)
        doc_first = run_idx[first_run]
        new_off = run_idx - np.repeat(doc_first, np.diff(
            np.append(np.flatnonzero(first_run), len(starts))
        ))
        return pa.Table.from_pydict(
            {
                "doc_id": ids.take(pa.array(run_parent)),
                "offset": pa.array(new_off, type=pa.int64()),
                "kind": kind_s.take(pa.array(starts)),
                "text": texts,
                "media_ref": ref_s.take(pa.array(starts)),
                "n_merged": pa.array(
                    np.diff(run_offsets).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return ds.map_batches(coalesce, batch_format="pyarrow")


def media_span_context(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, offset, media_ref, prev_text, next_text) — caption-context
    mining: every media span paired with the text of its nearest preceding
    and nearest following TEXT span inside the same document ('' when none
    exists on that side) — the alt-text/caption candidate extraction step
    of an interleaved multimodal curation pipeline (pair each image with
    its surrounding prose before any decode).

    Pure per-doc block-local map, zero shuffle: after the shared
    (parent, offset) lexsort, the nearest-preceding-text index per flat
    row is a sentinel-floored np.maximum.accumulate (doc boundaries
    inject ``doc_start - 1`` so a previous document's rows can never
    leak across), and the following side is the mirror pass on the
    reversed arrays. No Python loop over spans.

    Oracle: windowed MAX/MIN of text offsets over the UNNESTed spans
    (UNBOUNDED PRECEDING/FOLLOWING frames) + self-joins to fetch the
    texts."""

    def context(batch: pa.Table) -> pa.Table:
        empty = {
            "doc_id": pa.array([], type=pa.string()),
            "offset": pa.array([], type=pa.int64()),
            "media_ref": pa.array([], type=pa.string()),
            "prev_text": pa.array([], type=pa.string()),
            "next_text": pa.array([], type=pa.string()),
        }
        ids, parent, order, n_docs, f = _flat_spans(batch)
        n = len(parent)
        if n == 0:
            return pa.Table.from_pydict(empty)
        p_s = parent[order]
        take = pa.array(order)
        kind_s = f["kind"].take(take)
        text_s = f["text"].take(take)
        ref_s = f["media_ref"].take(take)
        off_s = f["offset"].take(take).to_numpy(zero_copy_only=False)
        is_media = pc.equal(kind_s, "media").to_numpy(zero_copy_only=False)
        idx = np.arange(n, dtype=np.int64)
        txt_idx = np.where(~is_media, idx, -1)
        doc_start = np.ones(n, dtype=bool)
        doc_start[1:] = p_s[1:] != p_s[:-1]
        starts = np.flatnonzero(doc_start)
        g = np.cumsum(doc_start) - 1
        s_d = starts[g]
        # nearest text strictly BEFORE i: shift, floor to the doc-start
        # sentinel (s_d - 1: always a previous-doc row, so unambiguous),
        # then one global cummax == the segmented cummax.
        prev_shift = np.empty(n, dtype=np.int64)
        prev_shift[0] = -1
        prev_shift[1:] = txt_idx[:-1]
        pr = np.maximum.accumulate(np.maximum(prev_shift, s_d - 1))
        prev_ok = pr >= s_d
        # nearest text strictly AFTER i: mirror pass on reversed arrays.
        # Doc ends e_d mirror starts; sentinel e_d + 1.
        ends = np.append(starts[1:] - 1, n - 1)
        e_d = ends[g]
        next_shift = np.empty(n, dtype=np.int64)
        next_shift[-1] = n
        nxt_vals = np.where(~is_media, idx, n + 1)
        next_shift[:-1] = nxt_vals[1:]
        rev = np.minimum(next_shift, e_d + 1)[::-1]
        nx = np.minimum.accumulate(rev)[::-1]
        next_ok = nx <= e_d
        m = np.flatnonzero(is_media)
        if len(m) == 0:
            return pa.Table.from_pydict(empty)

        def fetch(src_idx: np.ndarray, ok: np.ndarray) -> pa.Array:
            got = text_s.take(
                pa.array(np.where(ok, src_idx, 0)[m])
            ).to_pylist()
            okm = ok[m]
            return pa.array(
                [t if o else "" for t, o in zip(got, okm)],
                type=pa.string(),
            )

        return pa.Table.from_pydict(
            {
                "doc_id": ids.take(pa.array(p_s[m])),
                "offset": pa.array(off_s[m], type=pa.int64()),
                "media_ref": ref_s.take(pa.array(m)),
                "prev_text": fetch(pr, prev_ok),
                "next_text": fetch(nx, next_ok),
            }
        )

    return ds.map_batches(context, batch_format="pyarrow")


def caption_token_audit(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, offset, media_ref, prev_tokens, next_tokens, chosen,
    chosen_tokens) — caption-side selection audit on top of
    [[media_span_context]]: for every media span, whitespace token counts
    of the nearest text on each side and which side a caption miner
    should pair with (the longer side; ties and the both-empty case fall
    to 'prev' / 'none'). The budget signal for caption-pair curation:
    how much prose actually sits next to the images, and on which side.

    Same zero-shuffle per-doc shape as media_span_context (this runs as
    one extra vectorized map over its output). Oracle: the span-context
    window CTE + len(regexp_extract_all) token counts."""
    ctx = media_span_context(ds)

    def audit(batch: pa.Table) -> pa.Table:
        import re

        ws = re.compile(r"[^ \t\n\r\v\f]+")
        pt = [len(ws.findall(t)) for t in batch["prev_text"].to_pylist()]
        nt = [len(ws.findall(t)) for t in batch["next_text"].to_pylist()]
        chosen = [
            "none" if p == 0 and n == 0 else ("prev" if p >= n else "next")
            for p, n in zip(pt, nt)
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "offset": batch["offset"],
                "media_ref": batch["media_ref"],
                "prev_tokens": pa.array(pt, type=pa.int64()),
                "next_tokens": pa.array(nt, type=pa.int64()),
                "chosen": pa.array(chosen, type=pa.string()),
                "chosen_tokens": pa.array(
                    [max(p, n) for p, n in zip(pt, nt)], type=pa.int64()
                ),
            }
        )

    return ctx.map_batches(audit, batch_format="pyarrow")


def media_position_hist(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(bucket, n_media) — corpus-level decile histogram of WHERE media
    spans sit inside their documents: bucket = ``rank·10 // n_spans`` of
    each media span's offset-order rank (0 = document head, 9 = tail).
    The lead/trail layout signal a multimodal curator uses to pick
    caption-pairing direction before decoding a single byte.

    Per-block partial: one bincount over the offset-sorted flat view →
    ≤10-int rows per block → ONE tiny bucket-keyed sum. No payload ever
    shuffles.

    Oracle: ROW_NUMBER/COUNT window pair with the same integer-floor
    bucket formula."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, f = _flat_spans(batch)
        n = len(parent)
        empty = pa.Table.from_pydict(
            {
                "bucket": pa.array([], type=pa.int64()),
                "n_media": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        p_s = parent[order]
        is_media = pc.equal(f["kind"], "media").to_numpy(
            zero_copy_only=False
        )[order]
        n_spans = np.bincount(parent, minlength=n_docs).astype(np.int64)
        first = np.zeros(n, dtype=np.int64)
        firsts = np.flatnonzero(
            np.concatenate(([True], p_s[1:] != p_s[:-1]))
        )
        first[firsts] = 1
        doc_start = np.maximum.accumulate(
            np.where(first == 1, np.arange(n, dtype=np.int64), 0)
        )
        rank = np.arange(n, dtype=np.int64) - doc_start
        bucket = rank[is_media] * 10 // n_spans[p_s[is_media]]
        if len(bucket) == 0:
            return empty
        key, cnt = np.unique(bucket, return_counts=True)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(key, type=pa.int64()),
                "n_media": pa.array(cnt, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_media", alias_name="n_media"))
        .map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "bucket": b["bucket"].cast(pa.int64()),
                    "n_media": b["n_media"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def media_orphan_audit(
    ds: ray.data.Dataset, media: ray.data.Dataset
) -> ray.data.Dataset:
    """(media_ref, n_span_refs, status) — referential-integrity audit
    between the spans table and the media store, the interleaved twin of
    the relational [[fk_integrity]] check: ``dangling_ref`` rows are
    media spans whose ref has no stored payload (lost object, mangled
    URL); ``orphan_file`` rows are stored payloads no span references
    (delete candidates — at 100 TB orphaned media is real money).
    Consistent refs are omitted.

    Scale shape: the spans side pre-combines to one (ref, count) row per
    DISTINCT ref per block (text never rides); the store side ships one
    (ref, flag) row per object; ONE keyed tagged-union groupby on the
    ref string resolves both directions — no join operator, no driver
    state.

    Oracle: FULL OUTER JOIN of the unnested span refs against the
    read_blob filename listing."""
    from ray.data.aggregate import Sum

    def span_side(batch: pa.Table) -> pa.Table:
        _, _, _, _, fields = _flat_spans(batch, sort=False)
        kind = fields["kind"].to_numpy(zero_copy_only=False)
        refs = fields["media_ref"].to_numpy(zero_copy_only=False)
        m = refs[kind == "media"]
        uniq, counts = np.unique(m, return_counts=True)
        return pa.Table.from_pydict(
            {
                "media_ref": pa.array(uniq, type=pa.string()),
                "n_span_refs": pa.array(counts.astype(np.int64)),
                "n_files": pa.array(np.zeros(len(uniq), np.int64)),
            }
        )

    def file_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"].cast(pa.string()),
                "n_span_refs": pa.array([0] * n, type=pa.int64()),
                "n_files": pa.array([1] * n, type=pa.int64()),
            }
        )

    # NOTE: measured BOTH plans at bench scale — the spans scan
    # dominates (~10s of ~16s) and the ~90k-group aggregate overlaps
    # with it in ONE streaming execution; functions/exchange.py's
    # keyed_fold measured no faster here (15.6s vs 15.9s) because its
    # materialize barrier splits the plan into three executions and
    # forfeits the overlap. Keep the native groupby: same wall, simpler.
    merged = (
        ds.map_batches(span_side, batch_format="pyarrow")
        .union(media.map_batches(file_side, batch_format="pyarrow"))
        .groupby("media_ref")
        .aggregate(
            Sum("n_span_refs", alias_name="n_span_refs"),
            Sum("n_files", alias_name="n_files"),
        )
    )

    def statuses(batch: pa.Table) -> pa.Table:
        ns = batch["n_span_refs"].to_numpy(zero_copy_only=False)
        nf = batch["n_files"].to_numpy(zero_copy_only=False)
        bad = (ns == 0) | (nf == 0)
        t = batch.filter(pa.array(bad))
        ns_b = ns[bad]
        return pa.Table.from_pydict(
            {
                "media_ref": t["media_ref"],
                "n_span_refs": pa.array(ns_b, type=pa.int64()),
                "status": pa.array(
                    np.where(ns_b > 0, "dangling_ref", "orphan_file"),
                    type=pa.string(),
                ),
            }
        )

    return merged.map_batches(statuses, batch_format="pyarrow")


def canonicalize_media_refs(
    ds: ray.data.Dataset, media: ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, span_offset, media_ref, canonical_ref, rewritten) — the
    span-rewrite step [[media_content_dedup]]'s docstring promises: every
    media span's ref is replaced by its payload-dedup canonical (the
    lexicographically smallest ref sharing the payload md5), so
    downstream decode/embed stages key on ONE ref per distinct payload.

    Scale shape: media payloads hash inside the scan and drop
    ([[media_content_dedup]] reused verbatim); the flat media spans and
    the (ref, canonical) map meet in ONE keyed tagged-union groupby on
    the ref string — NO broadcast of the ref map (at 10^12 docs the
    media catalog is itself huge), no driver state.

    Oracle: unnested media spans JOIN the payload-md5 canonical CTE."""
    from .multimodal import media_content_dedup

    canon = media_content_dedup(media)

    def span_rows(batch: pa.Table) -> pa.Table:
        ids, parent, _, _, fields = _flat_spans(batch, sort=False)
        kind = fields["kind"].to_numpy(zero_copy_only=False)
        m = kind == "media"
        return pa.Table.from_pydict(
            {
                "media_ref": pa.array(
                    fields["media_ref"].to_numpy(zero_copy_only=False)[m],
                    type=pa.string(),
                ),
                "doc_id": pa.array(
                    ids.to_numpy(zero_copy_only=False)[parent][m],
                    type=pa.string(),
                ),
                "span_offset": pa.array(
                    fields["offset"]
                    .to_numpy(zero_copy_only=False)[m]
                    .astype(np.int64),
                    type=pa.int64(),
                ),
                "canonical_ref": pa.array([""] * int(m.sum()), type=pa.string()),
            }
        )

    def canon_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "media_ref": batch["media_ref"].cast(pa.string()),
                "doc_id": pa.array([""] * n, type=pa.string()),
                "span_offset": pa.array([-1] * n, type=pa.int64()),
                "canonical_ref": batch["canonical_ref"].cast(pa.string()),
            }
        )

    OUT = pa.schema(
        [
            ("doc_id", pa.string()),
            ("span_offset", pa.int64()),
            ("media_ref", pa.string()),
            ("canonical_ref", pa.string()),
            ("rewritten", pa.bool_()),
        ]
    )

    # ONE sort by (ref, span_offset) replaces a per-ref map_groups (one
    # Python call per distinct ref — ~70k at bench scale): the canon row
    # carries span_offset = -1 so it sorts FIRST in its group, and each
    # sorted block resolves its INTERIOR refs by group-start fancy
    # indexing; the <= 2 refs touching each block edge fold on the
    # driver (the functions/exchange.py pattern).
    merged = ds.map_batches(span_rows, batch_format="pyarrow").union(
        canon.map_batches(canon_rows, batch_format="pyarrow")
    )
    sorted_m = (
        merged.repartition(16)
        .sort(["media_ref", "span_offset"])
        .materialize()
    )

    def attach_interior(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return OUT.empty_table()
        ref = np.asarray(batch["media_ref"].to_pylist(), dtype=object)
        off = batch["span_offset"].to_numpy(zero_copy_only=False)
        canon_col = np.asarray(
            batch["canonical_ref"].to_pylist(), dtype=object
        )
        inner = (ref != ref[0]) & (ref != ref[-1])
        new = np.r_[True, ref[1:] != ref[:-1]]
        gs_idx = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        gs = gs_idx[gid]
        # a span row resolves iff its group START is a canon row
        # (refs with no stored payload have no canon row and drop —
        # same inner-join semantics as the map_groups attach)
        sel = inner & (off >= 0) & (off[gs] < 0)
        idx = np.flatnonzero(sel)
        canon_at = canon_col[gs[idx]]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].take(pa.array(idx)),
                "span_offset": batch["span_offset"].take(pa.array(idx)),
                "media_ref": pa.array(ref[idx], type=pa.string()),
                "canonical_ref": pa.array(canon_at, type=pa.string()),
                "rewritten": pa.array(ref[idx] != canon_at),
            },
            schema=OUT,
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        ref = np.asarray(batch["media_ref"].to_pylist(), dtype=object)
        if len(ref) == 0:
            return batch
        return batch.filter(pa.array((ref == ref[0]) | (ref == ref[-1])))

    interior = sorted_m.map_batches(
        attach_interior, batch_format="pyarrow", batch_size=None
    )
    by_ref: dict[str, dict] = {}
    for r in sorted_m.map_batches(
        edge_rows, batch_format="pyarrow", batch_size=None
    ).take_all():
        g = by_ref.setdefault(r["media_ref"], {"canon": None, "spans": []})
        if r["span_offset"] < 0:
            g["canon"] = r["canonical_ref"]
        else:
            g["spans"].append(r)
    b_rows = [
        {
            "doc_id": r["doc_id"],
            "span_offset": r["span_offset"],
            "media_ref": r["media_ref"],
            "canonical_ref": g["canon"],
            "rewritten": r["media_ref"] != g["canon"],
        }
        for g in by_ref.values()
        if g["canon"] is not None
        for r in g["spans"]
    ]
    return interior.union(
        ray.data.from_arrow(pa.Table.from_pylist(b_rows, schema=OUT))
    )


def span_kind_transitions(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(prev_kind, next_kind, n) — corpus-level first-order transition
    counts over each document's OFFSET-ORDERED span kinds: the layout
    grammar of the interleaved corpus ("what follows a table? how often
    does media open a document's tail?") that a rendering/packing
    planner reads before choosing chunk boundaries. Within-document
    bigrams only — documents are independent sequences.

    Shape: entirely block-local until the final tiny exchange — spans
    live inside their document row, so the (parent, offset) lexsort and
    the vectorized bigram collapse ([[event_transitions]]'s packed-code
    trick, with a parent-equality mask dropping cross-document pairs)
    never shuffle; ONE keyed sum over the <= kinds² pair domain
    finishes. Zero payload moves.

    Oracle: LAG(kind) OVER (PARTITION BY doc_id ORDER BY offset) on the
    UNNESTed spans table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _ids, parent, order, _n_docs, fields = _flat_spans(batch, sort=True)
        empty = pa.Table.from_pydict(
            {
                "prev_kind": pa.array([], type=pa.string()),
                "next_kind": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if len(parent) < 2:
            return empty
        kinds = np.asarray(fields["kind"].to_pylist(), dtype=object)[order]
        par_s = parent[order]
        uniq, codes = np.unique(kinds, return_inverse=True)
        same_doc = par_s[1:] == par_s[:-1]
        if not same_doc.any():
            return empty
        pair = (codes[:-1] * len(uniq) + codes[1:])[same_doc]
        keys, cnts = np.unique(pair, return_counts=True)
        return pa.Table.from_pydict(
            {
                "prev_kind": pa.array(uniq[keys // len(uniq)], type=pa.string()),
                "next_kind": pa.array(uniq[keys % len(uniq)], type=pa.string()),
                "n": pa.array(cnts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["prev_kind", "next_kind"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "prev_kind": batch["prev_kind"],
                "next_kind": batch["next_kind"],
                "n": batch["n"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def span_media_locality(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(dist, n) — corpus-wide histogram of each MEDIA span's distance
    (in span positions, offset order) to the nearest TEXT span of the
    same document; media in all-media documents report dist = -1. The
    caption-availability audit behind [[media_captions]]/
    [[curate_captions]]: how much of the media actually sits next to
    prose worth pairing, before a captioning stage is sized.

    Per-batch vectorized: one (parent, offset) lexsort, per-doc media
    and text position arrays, nearest via np.searchsorted; partial
    (dist, n) counts collapse each block to ≤ max-span-count rows and
    ONE tiny keyed sum finishes — document payloads never shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, fields = _flat_spans(batch)
        kind = fields["kind"].to_numpy(zero_copy_only=False)[order]
        par = parent[order]
        counts: dict[int, int] = {}
        # per-doc segment boundaries over the sorted flat rows
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        ends = np.r_[starts[1:], len(par)]
        for s, e in zip(starts, ends):
            k = kind[s:e]
            media_pos = np.flatnonzero(k == "media")
            if len(media_pos) == 0:
                continue
            text_pos = np.flatnonzero(k == "text")
            if len(text_pos) == 0:
                counts[-1] = counts.get(-1, 0) + len(media_pos)
                continue
            ins = np.searchsorted(text_pos, media_pos)
            left = np.where(
                ins > 0, media_pos - text_pos[np.maximum(ins - 1, 0)],
                np.iinfo(np.int64).max,
            )
            right = np.where(
                ins < len(text_pos),
                text_pos[np.minimum(ins, len(text_pos) - 1)] - media_pos,
                np.iinfo(np.int64).max,
            )
            for d in np.minimum(left, right):
                counts[int(d)] = counts.get(int(d), 0) + 1
        return pa.Table.from_pydict(
            {
                "dist": pa.array(list(counts.keys()), type=pa.int64()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dist")
        .aggregate(Sum("n", alias_name="n"))
    )


def span_run_lengths(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(kind, run_len, n_runs) — histogram of MAXIMAL same-kind span
    runs across the corpus (offset order within each doc): long media
    runs are image galleries, long text runs are prose walls — the
    layout-grammar census that sizes [[interleave_pack]]'s
    text/media interleaving budget and flags gallery-only pages before
    a captioning stage wastes compute on them
    ([[span_kind_transitions]] counts pair boundaries; this measures
    the full run-length distribution).

    Per-batch vectorized gaps-and-islands: one (parent, offset)
    lexsort, run starts are kind-change ∨ doc-change positions, run
    lengths fall out of np.diff on the start indices; (kind, len)
    Counter partials → ONE tiny keyed sum. The oracle is the classic
    row_number-difference islands query."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids, parent, order, n_docs, fields = _flat_spans(batch)
        kind = fields["kind"].to_numpy(zero_copy_only=False)[order]
        par = parent[order]
        n = len(par)
        c: Counter = Counter()
        if n:
            brk = np.r_[
                True, (par[1:] != par[:-1]) | (kind[1:] != kind[:-1])
            ]
            starts = np.flatnonzero(brk)
            lens = np.diff(np.r_[starts, n])
            for s, ln in zip(starts.tolist(), lens.tolist()):
                c[(kind[s], int(ln))] += 1
        return pa.Table.from_pydict(
            {
                "kind": pa.array([k for k, _ in c], type=pa.string()),
                "run_len": pa.array(
                    [ln for _, ln in c], type=pa.int64()
                ),
                "n_runs": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "run_len"])
        .aggregate(Sum("n_runs", alias_name="n_runs"))
    )
