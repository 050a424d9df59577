"""Mirror the driver's correctness gate early: run every queries() entry at
sf0.001 and compare row-count, schema and order-insensitive values against
its oracle_sql() DuckDB twin."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


class TestContract:
    def test_oracle_keys_subset_of_queries(self):
        assert set(ORACLES) <= set(QUERIES)

    def test_entry_runs(self, ray_session):
        ds = entry_mod.entry()
        df = _to_pandas(ds)
        assert len(df) > 0
        assert set(df.columns) == {"doc_id", "offset", "kind", "text", "media_ref"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con, ray_session):
    # The media oracles read the DRIVER-tier corpus media files (sf0.01 ->
    # /tmp/graft_corpus/t2, resolved via entry_mod._ORACLE_CORPUS_DIR — the
    # corpus-path-dependent oracles), so their queries must run at that sf.
    sf_dir = (
        "/root/testdata/sf0.01"
        if name
        in (
            "media_dims",
            "media_thumb_dims",
            "audio_features",
            "media_content_dedup",
            "span_stats",
            "media_captions",
            "interleave_render",
            "span_integrity",
            "interleave_pack",
            "span_boilerplate",
            "curate_captions",
            "interleave_shape_hist",
            "media_ref_fanout",
            "span_length_profile",
            "span_coalesce",
            "media_span_context",
            "caption_token_audit",
            "media_position_hist",
            "media_orphan_audit",
            "media_payload_size_hist",
            "canonicalize_media_refs",
            "span_kind_transitions",
            "span_media_locality",
            "span_run_lengths",
        )
        else SF_DIR
    )
    ray_df = _canon(_to_pandas(QUERIES[name](sf_dir)))
    sql_df = _canon(con.execute(ORACLES[name]).fetch_df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        ray_df.columns,
        sql_df.columns,
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)}"
    # order-insensitive value equality (mirrors the driver's value hash)
    ray_cmp = ray_df.astype(str)
    sql_cmp = sql_df.astype(str)
    mism = (ray_cmp != sql_cmp).any(axis=1)
    assert not mism.any(), f"{name}: first diff\n{ray_cmp[mism].head()}\n{sql_cmp[mism].head()}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES) - {"extract_spans"})
)
def test_rows_only_queries_run(name, ray_session):
    df = _to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df) >= 0
