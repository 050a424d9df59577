"""Keyed-exchange primitives tuned for HIGH-CARDINALITY keys.

Ray Data's ``groupby(key).aggregate(Sum(...))`` is sort-based and pays a
per-GROUP Python cost when it emits output rows; at ~1M distinct int64
keys that is 130µs/row — measured 8.8s (packed single key) / 14.3s
(two-column key) for a 1.3M-row Sum on this box, where a plain
``Dataset.sort`` + vectorized per-block run-length fold over the SAME
rows completes in 0.65s. ``keyed_fold`` packages that plan exactly:

    sort(keys)  ->  per-block ufunc.reduceat fold (whole-block batches)
                ->  the <= 2 keys touching each block edge fold on the
                    driver (the basket_pairs boundary pattern) and union
                    back as one tiny block

The all-to-all volume is identical to the groupby (one range shuffle of
the input rows); only the per-group Python output loop is eliminated.
Driver state is O(#blocks), never O(#keys). Exactness: Ray's range
partitioner can split one key's run across adjacent blocks — exactly
those runs surface in the edge pass and are merged once on the driver,
so the result equals the groupby bit-for-bit (asserted in tests against
``groupby().aggregate(...)`` on random skewed inputs).

Supported per-column ops: ``sum`` / ``min`` / ``max`` — each is an
associative, commutative ufunc reduction, so per-block partials merge
exactly at the edges. Keys may be ints or strings (string columns ride
as numpy object arrays through the run-length compare).

Use this for exchanges whose distinct-key count is a large fraction of
the row count (pair-key folds, shingle/bucket tallies, FK anti-joins).
For LOW cardinality (few output groups) the native groupby is fine and
keeps the plan simpler.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["global_row_number", "keyed_first", "keyed_fold", "keyed_sum"]

_UFUNC = {
    "sum": np.add,
    "min": np.minimum,
    "max": np.maximum,
    "or": np.bitwise_or,  # set-bit folds (idempotent, merge-exact)
}


def keyed_fold(
    ds: ray.data.Dataset,
    keys: list[str] | str,
    aggs: list[tuple[str, str]],
) -> ray.data.Dataset:
    """groupby(keys) + per-column sum/min/max for high-cardinality keys
    via sort + vectorized per-block run-length fold. ``aggs`` is a list
    of (column, op) with op in {sum, min, max}; output columns are
    ``keys + [col for col, _ in aggs]`` (value columns keep their
    names). See module docstring for the plan and exactness argument."""
    if isinstance(keys, str):
        keys = [keys]
    for col, op in aggs:
        if op not in _UFUNC:
            raise ValueError(f"unsupported op {op!r} for column {col!r}")
    vcols = [c for c, _ in aggs]
    sorted_ds = ds.sort(keys).materialize()
    schema = sorted_ds.schema()
    if schema is None:  # zero-row input: echo an empty (keys + values) table
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {c: pa.array([], type=pa.int64()) for c in [*keys, *vcols]}
            )
        )
    fields = {
        name: schema.base_schema.field(name).type for name in [*keys, *vcols]
    }

    def _fold_block(
        batch: pa.Table,
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        karrs = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
        n = batch.num_rows
        new = np.ones(n, dtype=bool)
        if n > 1:
            diff = np.zeros(n - 1, dtype=bool)
            for ka in karrs:
                diff |= ka[1:] != ka[:-1]
            new[1:] = diff
        idx = np.flatnonzero(new)
        vals = []
        for col, op in aggs:
            v = batch[col].to_numpy(zero_copy_only=False)
            vals.append(_UFUNC[op].reduceat(v, idx) if n else v[:0])
        return [ka[idx] for ka in karrs], vals

    def _table(kcols: list[np.ndarray], vals: list[np.ndarray]) -> pa.Table:
        return pa.Table.from_pydict(
            {
                **{
                    k: pa.array(kc, type=fields[k])
                    for k, kc in zip(keys, kcols)
                },
                **{
                    c: pa.array(v, type=fields[c])
                    for c, v in zip(vcols, vals)
                },
            }
        )

    def interior(batch: pa.Table) -> pa.Table:
        kcols, vals = _fold_block(batch)
        m = len(kcols[0])
        if m == 0:
            return _table(kcols, vals)
        is_first = np.ones(m, dtype=bool)
        is_last = np.ones(m, dtype=bool)
        for kc in kcols:
            is_first &= kc == kc[0]
            is_last &= kc == kc[-1]
        keep = ~(is_first | is_last)
        return _table(
            [kc[keep] for kc in kcols], [v[keep] for v in vals]
        )

    def edges(batch: pa.Table) -> pa.Table:
        kcols, vals = _fold_block(batch)
        m = len(kcols[0])
        if m == 0:
            return _table(kcols, vals)
        sel = np.zeros(m, dtype=bool)
        sel[0] = True
        sel[-1] = True
        return _table([kc[sel] for kc in kcols], [v[sel] for v in vals])

    interior_ds = sorted_ds.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    )
    # <= 2 folded rows per block: merge the block-edge keys (the only
    # keys the range partitioner can split across blocks) on the driver
    merged: dict[tuple, list] = {}
    for r in sorted_ds.map_batches(
        edges, batch_format="pyarrow", batch_size=None
    ).take_all():
        kk = tuple(r[k] for k in keys)
        cur = merged.get(kk)
        if cur is None:
            merged[kk] = [r[c] for c in vcols]
        else:
            for i, (c, op) in enumerate(aggs):
                if op == "sum":
                    cur[i] = cur[i] + r[c]
                elif op == "or":
                    cur[i] = cur[i] | r[c]
                else:
                    cur[i] = (min if op == "min" else max)(cur[i], r[c])
    edge_tbl = pa.Table.from_pydict(
        {
            **{
                k: pa.array([kk[i] for kk in merged], type=fields[k])
                for i, k in enumerate(keys)
            },
            **{
                c: pa.array(
                    [v[i] for v in merged.values()], type=fields[c]
                )
                for i, c in enumerate(vcols)
            },
        }
    )
    return interior_ds.union(ray.data.from_arrow(edge_tbl))


def keyed_sum(
    ds: ray.data.Dataset, keys: list[str] | str, value: str
) -> ray.data.Dataset:
    """groupby(keys).sum(value) — the single-op form of keyed_fold."""
    return keyed_fold(ds, keys, [(value, "sum")])


def keyed_first(
    ds: ray.data.Dataset, keys: list[str] | str, order_cols: list[str]
) -> ray.data.Dataset:
    """Per distinct ``keys`` tuple, the single row sorting FIRST by
    (keys + order_cols) — the distributed argmin / representative pick
    (e.g. min ref per content hash). Same sort + run-length plan and
    block-edge driver fold as keyed_fold; output columns are
    ``keys + order_cols``."""
    if isinstance(keys, str):
        keys = [keys]
    all_cols = [*keys, *order_cols]
    sorted_ds = ds.sort(all_cols).materialize()
    schema = sorted_ds.schema()
    if schema is None:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {c: pa.array([], type=pa.int64()) for c in all_cols}
            )
        )
    fields = {n: schema.base_schema.field(n).type for n in all_cols}

    def _starts(batch: pa.Table) -> np.ndarray:
        karrs = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
        n = batch.num_rows
        new = np.ones(n, dtype=bool)
        if n > 1:
            diff = np.zeros(n - 1, dtype=bool)
            for ka in karrs:
                diff |= ka[1:] != ka[:-1]
            new[1:] = diff
        return new

    def interior(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.select(all_cols)
        karr0 = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
        is_first = np.ones(n, dtype=bool)
        is_last = np.ones(n, dtype=bool)
        for ka in karr0:
            is_first &= ka == ka[0]
            is_last &= ka == ka[-1]
        sel = _starts(batch) & ~(is_first | is_last)
        return batch.select(all_cols).filter(pa.array(sel))

    def edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.select(all_cols)
        karr0 = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
        is_first = np.ones(n, dtype=bool)
        is_last = np.ones(n, dtype=bool)
        for ka in karr0:
            is_first &= ka == ka[0]
            is_last &= ka == ka[-1]
        # only the first row of each edge key can win globally
        sel = _starts(batch) & (is_first | is_last)
        return batch.select(all_cols).filter(pa.array(sel))

    interior_ds = sorted_ds.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    )
    best: dict[tuple, tuple] = {}
    for r in sorted_ds.map_batches(
        edges, batch_format="pyarrow", batch_size=None
    ).take_all():
        kk = tuple(r[k] for k in keys)
        cand = tuple(r[c] for c in order_cols)
        if kk not in best or cand < best[kk]:
            best[kk] = cand
    edge_tbl = pa.Table.from_pydict(
        {
            **{
                k: pa.array([kk[i] for kk in best], type=fields[k])
                for i, k in enumerate(keys)
            },
            **{
                c: pa.array(
                    [v[i] for v in best.values()], type=fields[c]
                )
                for i, c in enumerate(order_cols)
            },
        }
    )
    return interior_ds.union(ray.data.from_arrow(edge_tbl))


def global_row_number(
    ds: ray.data.Dataset, order_cols: list[str]
) -> ray.data.Dataset:
    """Append a 0-based global ``r`` = ROW_NUMBER() over ``order_cols``
    (which must form a TOTAL order — include a unique id as the last
    column). The distributed window-rank primitive shared by the
    rank-blend selection ops: ONE global sort, then the block-offset
    pattern — pass 1 reads one (block-first key, count) meta row per
    block (batch_size=None so both passes see identical block
    boundaries), the driver prefix-sums O(#blocks) counts, pass 2 adds
    offset + within-block position vectorized. Rows never move after
    the sort; driver state is O(#blocks)."""
    import ray as _ray

    sorted_ds = ds.sort(order_cols).materialize()
    schema = sorted_ds.schema()
    if schema is None:
        return sorted_ds

    def meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "k": pa.array([], type=pa.string()),
                    "count": pa.array([], type=pa.int64()),
                }
            )
        key = repr(tuple(batch[c][0].as_py() for c in order_cols))
        return pa.Table.from_pydict(
            {
                "k": pa.array([key], type=pa.string()),
                "count": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    metas = sorted_ds.map_batches(
        meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    # driver-side prefix sums in SORT order of the block-first keys:
    # the keys are tuples rendered by repr, so sort the metas by the
    # underlying tuples instead.
    import ast as _ast

    metas.sort(key=lambda r: _ast.literal_eval(r["k"]))
    offsets: dict[str, int] = {}
    run = 0
    for m in metas:
        offsets[m["k"]] = run
        run += m["count"]
    off_ref = _ray.put(offsets)

    def add_rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("r", pa.array([], type=pa.int64()))
        offs = _ray.get(off_ref)
        key = repr(tuple(batch[c][0].as_py() for c in order_cols))
        r = offs[key] + np.arange(batch.num_rows, dtype=np.int64)
        return batch.append_column("r", pa.array(r, type=pa.int64()))

    return sorted_ds.map_batches(
        add_rank, batch_format="pyarrow", batch_size=None
    )
