"""Corpus-level GriTS evaluation harness (round-2 verdict item 7):
per-table GriTS -> mean per metric via one keyed groupby, reference
transformer/src/grits.py:813+ semantics."""

import pyarrow as pa

from tableextraction_ray import metrics

CELL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int64()),
        ("table_no", pa.int64()),
        ("x1", pa.int64()),
        ("y1", pa.int64()),
        ("x2", pa.int64()),
        ("y2", pa.int64()),
        ("text", pa.string()),
    ]
)


def _cells(doc_id, offset, table_no, grid_texts):
    """2x2 cell rows: rows at y=0/30 (beyond the epsilon=20 row grouping),
    cols at x=0/20."""
    rows = []
    for r, row in enumerate(grid_texts):
        for c, text in enumerate(row):
            rows.append(
                {
                    "doc_id": doc_id,
                    "offset": offset,
                    "table_no": table_no,
                    "x1": c * 20,
                    "y1": r * 30,
                    "x2": (c + 1) * 20,
                    "y2": (r + 1) * 30,
                    "text": text,
                }
            )
    return rows


class TestTableGrid:
    def test_reading_order(self):
        pairs = [
            ((20, 30, 40, 60), "d"),
            ((0, 0, 20, 30), "a"),
            ((20, 0, 40, 30), "b"),
            ((0, 30, 20, 60), "c"),
        ]
        assert metrics.table_grid(pairs) == [["a", "b"], ["c", "d"]]
        assert metrics.table_grid([]) == []


class TestGritsCorpusPerturbed:
    def test_hand_computed_means(self, ray_session):
        """Two tables: one identical, one with a single cell replaced by a
        zero-LCS text. Hand computation:

        - perfect table: con=top=loc=adj=1.0
        - perturbed 2x2 [[aa,bb],[cc,dd]] vs [[aa,bb],[cc,xx]]:
          con   = 2*(1+1+1+0)/(4+4) = 0.75   (LCS('dd','xx')=0)
          top   = 1.0 (same shape), loc = 1.0 (same boxes)
          adj   : gold rels {(aa,bb,h),(cc,dd,h),(aa,cc,v),(bb,dd,v)},
                  pred rels {(aa,bb,h),(cc,xx,h),(aa,cc,v),(bb,xx,v)};
                  tp=2 -> P=R=F1=0.5

        Means over 2 tables: con 0.875, top 1.0, loc 1.0, P/R/F1 0.75.
        """
        import ray.data

        gold_rows = _cells("d0", 1, 0, [["aa", "bb"], ["cc", "dd"]]) + _cells(
            "d0", 3, 0, [["pp", "qq"], ["rr", "ss"]]
        )
        pred_rows = _cells("d0", 1, 0, [["aa", "bb"], ["cc", "xx"]]) + _cells(
            "d0", 3, 0, [["pp", "qq"], ["rr", "ss"]]
        )
        gold = ray.data.from_arrow(pa.Table.from_pylist(gold_rows, schema=CELL_SCHEMA))
        pred = ray.data.from_arrow(pa.Table.from_pylist(pred_rows, schema=CELL_SCHEMA))

        [summary] = metrics.grits_corpus(pred, gold).take_all()
        assert summary["n_tables"] == 2
        assert summary["mean_grits_con_fp6"] == 875000
        assert summary["mean_grits_top_fp6"] == 1000000
        assert summary["mean_grits_loc_fp6"] == 1000000
        assert summary["mean_adj_precision_fp6"] == 750000
        assert summary["mean_adj_recall_fp6"] == 750000
        assert summary["mean_adj_f1_fp6"] == 750000

        per = {
            (r["doc_id"], r["offset"], r["table_no"]): r
            for r in metrics.grits_corpus(pred, gold, per_table=True).take_all()
        }
        assert per[("d0", 1, 0)]["grits_con_fp6"] == 750000
        assert per[("d0", 3, 0)]["grits_con_fp6"] == 1000000

    def test_one_sided_table_scores_zero(self, ray_session):
        import ray.data

        gold_rows = _cells("d1", 1, 0, [["aa", "bb"], ["cc", "dd"]])
        pred = ray.data.from_arrow(pa.Table.from_pylist([], schema=CELL_SCHEMA))
        gold = ray.data.from_arrow(pa.Table.from_pylist(gold_rows, schema=CELL_SCHEMA))
        [summary] = metrics.grits_corpus(pred, gold).take_all()
        assert summary["n_tables"] == 1
        assert summary["mean_grits_con_fp6"] == 0
        assert summary["mean_adj_f1_fp6"] == 0


class TestGritsCorpusGolden:
    def test_golden_corpus_means_are_one(self, ray_session):
        """The extraction pipeline's cells vs the datagen ground truth:
        content/topology/adjacency means must be EXACTLY 1.0 on the golden
        corpus. Location mean is bounded below 1.0 only by the 1-px
        crop-origin ambiguity between detected table crops and the logical
        table frame (IoU of otherwise-identical boxes)."""
        from tableextraction_ray.datagen import generate_corpus, golden_cells
        from tableextraction_ray.pipelines.extract import build_cells_pipeline

        corpus = generate_corpus("/tmp/graft_corpus/t1", tier="t1")
        pred = build_cells_pipeline(corpus)
        gold = golden_cells(corpus)
        [summary] = metrics.grits_corpus(pred, gold).take_all()
        assert summary["n_tables"] > 30
        assert summary["mean_grits_con_fp6"] == 1000000
        assert summary["mean_grits_top_fp6"] == 1000000
        assert summary["mean_adj_f1_fp6"] == 1000000
        assert summary["mean_grits_loc_fp6"] >= 990000
