"""Keyed-exchange primitives tuned for HIGH-CARDINALITY keys.

Ray Data's ``groupby(key).aggregate(Sum(...))`` is sort-based and pays a
per-GROUP Python cost when it emits output rows; at ~1M distinct int64
keys that is 130µs/row — measured 8.8s (packed single key) / 14.3s
(two-column key) for a 1.3M-row Sum on this box, where a plain
``Dataset.sort`` + vectorized per-block run-length fold over the SAME
rows completes in 0.65s. ``keyed_sum`` packages that plan exactly:

    sort(keys)  ->  per-block np.add.reduceat fold (whole-block batches)
                ->  the <= 2 keys touching each block edge fold on the
                    driver (the basket_pairs boundary pattern) and union
                    back as one tiny block

The all-to-all volume is identical to the groupby (one range shuffle of
the input rows); only the per-group Python output loop is eliminated.
Driver state is O(#blocks), never O(#keys). Exactness: Ray's range
partitioner can split one key's run across adjacent blocks — exactly
those runs surface in the edge pass and are merged once on the driver,
so the result equals the groupby bit-for-bit (asserted in tests against
``groupby().aggregate(Sum)`` on random skewed inputs).

Use this for exchanges whose distinct-key count is a large fraction of
the row count (pair-key folds, shingle/bucket tallies). For LOW
cardinality (few output groups) the native groupby is fine and keeps
the plan simpler.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["keyed_sum"]


def _fold_block(
    batch: pa.Table, keys: list[str], value: str
) -> tuple[list[np.ndarray], np.ndarray]:
    """Run-length fold of an already key-sorted block: per distinct key
    tuple, the sum of ``value``. Returns (key columns, sums)."""
    karrs = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
    v = batch[value].to_numpy(zero_copy_only=False)
    n = len(v)
    new = np.ones(n, dtype=bool)
    if n > 1:
        diff = np.zeros(n - 1, dtype=bool)
        for ka in karrs:
            diff |= ka[1:] != ka[:-1]
        new[1:] = diff
    idx = np.flatnonzero(new)
    sums = np.add.reduceat(v, idx) if n else v[:0]
    return [ka[idx] for ka in karrs], sums


def keyed_sum(
    ds: ray.data.Dataset, keys: list[str] | str, value: str
) -> ray.data.Dataset:
    """groupby(keys).sum(value) for high-cardinality numeric keys via
    sort + vectorized per-block run-length fold; output columns are
    ``keys + [value]`` (the value column keeps its name). See module
    docstring for the plan and the exactness argument."""
    if isinstance(keys, str):
        keys = [keys]
    sorted_ds = ds.sort(keys).materialize()
    schema = sorted_ds.schema()
    if schema is None:  # zero-row input: echo an empty (keys + value) table
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {c: pa.array([], type=pa.int64()) for c in [*keys, value]}
            )
        )
    fields = {name: schema.base_schema.field(name).type for name in [*keys, value]}

    def _table(kcols: list[np.ndarray], sums: np.ndarray) -> pa.Table:
        return pa.Table.from_pydict(
            {
                **{
                    k: pa.array(kc, type=fields[k])
                    for k, kc in zip(keys, kcols)
                },
                value: pa.array(sums, type=fields[value]),
            }
        )

    def interior(batch: pa.Table) -> pa.Table:
        kcols, sums = _fold_block(batch, keys, value)
        if len(sums) == 0:
            return _table(kcols, sums)
        first = tuple(kc[0] for kc in kcols)
        last = tuple(kc[-1] for kc in kcols)
        is_first = np.ones(len(sums), dtype=bool)
        is_last = np.ones(len(sums), dtype=bool)
        for kc, f, l in zip(kcols, first, last):
            is_first &= kc == f
            is_last &= kc == l
        keep = ~(is_first | is_last)
        return _table([kc[keep] for kc in kcols], sums[keep])

    def edges(batch: pa.Table) -> pa.Table:
        kcols, sums = _fold_block(batch, keys, value)
        if len(sums) == 0:
            return _table(kcols, sums)
        sel = np.zeros(len(sums), dtype=bool)
        sel[0] = True
        sel[-1] = True
        return _table([kc[sel] for kc in kcols], sums[sel])

    interior_ds = sorted_ds.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    )
    # <= 2 folded rows per block: merge the block-edge keys (the only
    # keys the range partitioner can split across blocks) on the driver
    merged: dict[tuple, int] = {}
    for r in sorted_ds.map_batches(
        edges, batch_format="pyarrow", batch_size=None
    ).take_all():
        kk = tuple(r[k] for k in keys)
        merged[kk] = merged.get(kk, 0) + r[value]
    edge_tbl = pa.Table.from_pydict(
        {
            **{
                k: pa.array([kk[i] for kk in merged], type=fields[k])
                for i, k in enumerate(keys)
            },
            value: pa.array(list(merged.values()), type=fields[value]),
        }
    )
    return interior_ds.union(ray.data.from_arrow(edge_tbl))
