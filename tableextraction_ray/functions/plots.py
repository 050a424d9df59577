"""Plot-digitization as a distributed stage.

The reference digitizes plot images interactively
(``plot_processing/PlotProcessing.ipynb``); here the same chain
(threshold -> markers -> cluster -> fit) runs as a stateless
``map_batches`` over a Dataset of plot images. The sandbox query
synthesizes one deterministic scatter plot per embedding row (first
``n_pts`` components as marker positions) so the operator is exercised
end-to-end over a real distributed input without shipping plot fixtures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..plot_digitize import digitize_plot

SIZE = 96
N_PTS = 6


def _render_scatter(embedding: list[float]) -> np.ndarray:
    img = np.full((SIZE, SIZE), 255, dtype=np.uint8)
    for i in range(N_PTS):
        # map component [-1, 1]-ish to margin-safe pixel coords
        v = float(embedding[i])
        x = 8 + int((i + 0.5) * (SIZE - 16) / N_PTS)
        y = 8 + int((min(max(v, -1.0), 1.0) + 1.0) * 0.5 * (SIZE - 16))
        img[y - 2 : y + 3, x - 2 : x + 3] = 0
    return img


def digitize_plots(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(vec_id, n_points, slope_fp6) — synthesize a scatter per row, run the
    full digitization chain, report recovered marker count and fitted
    linear slope (1e6 fixed-point). Rows-only check (image op)."""
    from . import fp

    def batch_fn(batch: pa.Table) -> pa.Table:
        n_out, s_out = [], []
        for emb in batch["embedding"].to_pylist():
            res = digitize_plot(_render_scatter(emb), degree=1)
            n_out.append(len(res["points"]))
            s_out.append(fp(res["coeffs"][-2], 6))
        return pa.Table.from_pydict(
            {
                "vec_id": batch["vec_id"],
                "n_points": pa.array(n_out, type=pa.int64()),
                "slope_fp6": pa.array(s_out, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")
