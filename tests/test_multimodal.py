"""Multimodal stage plumbing + IVF recall tests (sf0.001 / t1 corpus)."""

import numpy as np
import pytest

import __ray_entry__ as entry_mod
from tableextraction_ray.functions import multimodal, similarity
from tableextraction_ray.png import decode_gray
from tableextraction_ray.sources import read_media

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_ds(ray_session):
    return read_media(entry_mod._corpus_for(SF_DIR))


class TestMultimodal:
    def test_image_stats_real_decode(self, media_ds):
        rows = multimodal.media_stats(media_ds).take_all()
        assert len(rows) > 0
        for r in rows:
            assert r["width"] > 0 and r["height"] > 0
            assert 0 <= r["ink_fp6"] <= 1_000_000

    def test_thumbnails_roundtrip(self, media_ds):
        rows = multimodal.media_thumbnails(media_ds, max_side=64).take_all()
        for r in rows:
            thumb = decode_gray(r["thumb"])
            assert thumb.shape == (r["thumb_h"], r["thumb_w"])
            assert max(thumb.shape) <= 64 or max(thumb.shape) <= 65  # ceil-div scale

    def test_audio_fake_deterministic(self, media_ds):
        a = sorted(multimodal.audio_features(media_ds).take_all(), key=lambda r: r["media_ref"])
        b = sorted(multimodal.audio_features(media_ds).take_all(), key=lambda r: r["media_ref"])
        assert a == b
        assert all(r["n_channels"] in (1, 2) for r in a)

    def test_video_fanout_and_decode(self, media_ds):
        n_media = media_ds.count()
        rows = multimodal.video_frames(media_ds).take_all()
        assert len(rows) == 3 * n_media
        frame = decode_gray(rows[0]["frame_png"])
        assert frame.shape == (32, 32)

    def test_real_backends_are_gated(self):
        with pytest.raises(NotImplementedError):
            multimodal.AudioFeatures(backend="soundfile")
        with pytest.raises(NotImplementedError):
            multimodal.VideoFrameSample(backend="ffmpeg")


class TestIvf:
    def test_recall_vs_bruteforce(self, ray_session):
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        exact = {
            (r["query_id"], r["vec_id"])
            for r in similarity.knn_bruteforce(emb).take_all()
        }
        approx = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_knn(emb).take_all()
        }
        assert len(approx & exact) / len(exact) >= 0.5

    def test_full_probe_is_exact(self, ray_session):
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        exact = sorted(
            similarity.knn_bruteforce(emb).take_all(),
            key=lambda r: (r["query_id"], -r["cos_fp5"], r["vec_id"]),
        )
        full = sorted(
            similarity.ivf_knn(emb, nlist=8, nprobe=8).take_all(),
            key=lambda r: (r["query_id"], -r["cos_fp5"], r["vec_id"]),
        )
        assert exact == full


class TestSemanticDedup:
    def test_keep_rule_matches_local_recompute(self, ray_session):
        """Replay the dominance rule locally from the operator's own
        cluster assignments: v is dropped iff a lower-id cluster-mate has
        quantized cosine >= threshold."""
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        out = {r["vec_id"]: r for r in similarity.semantic_dedup(emb).take_all()}
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.take_all()
        }
        assert set(out) == set(vecs)
        by_cid: dict[int, list[int]] = {}
        for vid, r in out.items():
            by_cid.setdefault(r["cid"], []).append(vid)
        n_dropped = 0
        for members in by_cid.values():
            members.sort()
            mat = similarity._quantize(np.asarray([vecs[v] for v in members]))
            cos = similarity._fp5(similarity._cos_matrix(mat, mat))
            for i, vid in enumerate(members):
                dominated = bool((cos[i, :i] >= similarity.NEAR_DUP_FP5).any())
                assert out[vid]["keep"] == (not dominated), vid
                n_dropped += dominated
        assert n_dropped > 0  # the threshold must actually bite
        # lowest id of every cluster is always kept
        for members in by_cid.values():
            assert out[min(members)]["keep"]

    def test_partition_invariance(self, ray_session):
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        a = sorted(
            similarity.semantic_dedup(emb).take_all(), key=lambda r: r["vec_id"]
        )
        b = sorted(
            similarity.semantic_dedup(emb.repartition(13)).take_all(),
            key=lambda r: r["vec_id"],
        )
        assert a == b


class TestKmeansQuantizer:
    """kmeans_centroids must beat the first-nlist-vectors quantizer where
    it matters: clustered data whose head vectors all come from one
    cluster (the pathological case for the toy init)."""

    def test_refined_centroids_follow_clusters(self, ray_session):
        import numpy as np
        import ray.data

        from tableextraction_ray.functions import similarity as S

        rng = np.random.default_rng(7)
        centers = rng.standard_normal((4, 16)) * 4
        vecs = []
        for i in range(400):
            c = centers[i // 100]  # head vectors (vec_id<8) all in cluster 0
            vecs.append({"vec_id": i, "embedding": (c + rng.standard_normal(16) * 0.1).tolist()})
        ds = ray.data.from_items(vecs)
        init = np.asarray([vecs[i]["embedding"] for i in range(8)])
        refined = S.kmeans_centroids(ds, init, iters=3)

        mat = np.asarray([v["embedding"] for v in vecs])

        def quant_quality(cent):
            # mean cosine of each vector to its nearest centroid — the
            # quantity IVF cell quality is made of
            cos = S._cos_matrix(S._quantize(mat), S._quantize(cent))
            return float(cos.max(axis=1).mean())

        assert quant_quality(refined) > quant_quality(init) + 0.05


class TestThumbDimsContract:
    def test_thumb_dims_match_real_resize(self, ray_session, t1_corpus):
        """media_thumb_dims (metadata-only, SQL-oracled) predicts EXACTLY
        the dimensions media_thumbnails produces by real decode+resize —
        joining the two covers the thumbnail pipeline's sizing contract."""
        from tableextraction_ray.functions import multimodal
        from tableextraction_ray.sources import read_media

        media = read_media(t1_corpus)
        predicted = {
            r["media_ref"]: (r["thumb_w"], r["thumb_h"])
            for r in multimodal.media_thumb_dims(media).take_all()
        }
        actual = {
            r["media_ref"]: (r["thumb_w"], r["thumb_h"])
            for r in multimodal.media_thumbnails(media).take_all()
        }
        assert predicted == actual
        assert len(actual) > 0


class TestLabelCentroidStats:
    def test_perfect_cohesion_and_partition_invariance(self, ray_session):
        import ray.data

        from tableextraction_ray.functions import similarity as S

        # two labels, each a point mass -> every member IS the centroid,
        # cosine exactly 1.0 (fp5 = 100000)
        items = [
            {"vec_id": i, "embedding": ([1.0, 0.0] * 8 if i % 2 else [0.0, 1.0] * 8),
             "label": i % 2}
            for i in range(40)
        ]
        ds = ray.data.from_items(items)
        out = {r["label"]: r for r in S.label_centroid_stats(ds).take_all()}
        assert out[0]["n_vecs"] == 20 and out[1]["n_vecs"] == 20
        assert out[0]["mean_cos_fp5"] == 100000
        assert out[1]["sum_cos_fp5"] == 20 * 100000
        a = sorted(S.label_centroid_stats(ds).take_all(), key=lambda r: r["label"])
        b = sorted(
            S.label_centroid_stats(ds.repartition(7)).take_all(),
            key=lambda r: r["label"],
        )
        assert a == b

    def test_incoherent_label_scores_lower(self, ray_session):
        import numpy as np
        import ray.data

        from tableextraction_ray.functions import similarity as S

        rng = np.random.default_rng(3)
        items = []
        base = rng.standard_normal(16)
        for i in range(30):  # coherent label 0
            items.append({"vec_id": i, "embedding": (base + rng.standard_normal(16) * 0.05).tolist(), "label": 0})
        for i in range(30, 60):  # incoherent label 1
            items.append({"vec_id": i, "embedding": rng.standard_normal(16).tolist(), "label": 1})
        out = {r["label"]: r for r in S.label_centroid_stats(ray.data.from_items(items)).take_all()}
        assert out[0]["mean_cos_fp5"] > out[1]["mean_cos_fp5"]


class TestPq:
    def test_recall_vs_exact_inner_product(self, ray_session):
        """PQ/ADC ranks by approximate inner product; compare against the
        exact quantized-dot top-k computed locally."""
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
        mat = np.floor(
            np.asarray([r["embedding"] for r in rows], dtype=np.float64) * 1e6 + 0.5
        )
        exact = set()
        for q in range(8):
            dots = (mat @ mat[q]).astype(np.int64)
            vids = np.arange(len(rows))
            mask = vids != q
            order = np.lexsort((vids[mask], -dots[mask]))[:10]
            exact |= {(q, int(v)) for v in vids[mask][order]}
        # Pure ADC on near-random synthetic vectors is genuinely coarse
        # (16 codewords/subspace); the honest bar is low — the production
        # path is the reranked variant below.
        approx = {
            (r["query_id"], r["vec_id"])
            for r in similarity.pq_topk(emb).take_all()
        }
        assert len(approx & exact) / len(exact) >= 0.25
        # Two-stage ADC-shortlist + exact rerank recovers the true top-k.
        rer = {
            (r["query_id"], r["vec_id"])
            for r in similarity.pq_topk_rerank(emb).take_all()
        }
        assert len(rer & exact) / len(exact) >= 0.9

    def test_init_codewords_reconstruct_exactly(self, ray_session):
        """With iters=0 the codebooks ARE the first-16 vectors' subvectors,
        so those vectors encode losslessly and their ADC score equals the
        exact quantized inner product."""
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
        mat = np.floor(
            np.asarray([r["embedding"] for r in rows[:16]], dtype=np.float64) * 1e6
            + 0.5
        )
        out = {
            (r["query_id"], r["vec_id"]): r["adot"]
            for r in similarity.pq_topk(emb, iters=0).take_all()
        }
        for (q, v), adot in out.items():
            if v < 16:
                assert adot == int(mat[q] @ mat[v])


class TestStack:
    def test_fast_path_matches_fallback(self):
        import pyarrow as pa

        from tableextraction_ray.functions.similarity import _stack

        uniform = pa.table(
            {"embedding": pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32()))}
        )
        m = _stack(uniform)
        assert m.dtype == np.float64 and m.shape == (2, 2)
        assert np.array_equal(m, [[1.0, 2.0], [3.0, 4.0]])

    def test_ragged_and_null_fall_back(self):
        import pyarrow as pa

        from tableextraction_ray.functions.similarity import _stack

        # sliced chunked column still hits the fast path correctly
        col = pa.chunked_array(
            [[[1.0, 2.0]], [[3.0, 4.0], [5.0, 6.0]]], type=pa.list_(pa.float32())
        )
        sliced = pa.table({"embedding": col.slice(1, 2)})
        assert np.array_equal(_stack(sliced), [[3.0, 4.0], [5.0, 6.0]])
        # ragged rows are a contract violation (embeddings are fixed-dim)
        # and must fail loudly, same as before the fast path existed
        ragged = pa.table(
            {"embedding": pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float32()))}
        )
        with pytest.raises(ValueError):
            _stack(ragged)


class TestPqIndexIncremental:
    """Incremental index append: codes/errors for odd vec_ids must equal a
    local recompute that trains books on the even side and encodes odd
    rows against them frozen."""

    @staticmethod
    def _embs(n=48, dim=64, seed=7):
        rng = np.random.default_rng(seed)
        return [
            {"vec_id": i, "embedding": rng.normal(size=dim).astype(float).tolist()}
            for i in range(n)
        ]

    def test_matches_local_recompute(self, ray_session):
        import ray.data

        from tableextraction_ray.functions import similarity as S

        rows = self._embs()
        ds = ray.data.from_items(rows)
        out = {
            r["vec_id"]: (r["code_packed"], r["sq_err"])
            for r in S.pq_index_incremental(ds).take_all()
        }
        assert set(out) == {r["vec_id"] for r in rows if r["vec_id"] % 2 == 1}

        # local mirror: same init (first 16 even), same frozen books
        even = [r for r in rows if r["vec_id"] % 2 == 0]
        init_q = S._quantize(
            np.asarray([r["embedding"] for r in even[:16]], dtype=np.float64)
        )
        books = S.pq_codebooks(
            ray.data.from_items(even), init_q, m_sub=8, iters=2
        )
        sd = books.shape[2]
        for r in rows:
            if r["vec_id"] % 2 == 0:
                continue
            x = S._quantize(
                np.asarray([r["embedding"]], dtype=np.float64)
            )[0]
            packed, err = 0, 0
            for m in range(8):
                xm = x[m * sd : (m + 1) * sd]
                cb = books[m]
                key = (cb * cb).sum(axis=1) - 2.0 * (cb @ xm)
                c = int(np.argmin(key))
                packed += c << (4 * m)
                err += int((xm * xm).sum()) + int(key[c])
            assert out[r["vec_id"]] == (packed, err), r["vec_id"]

    def test_partition_invariance(self, ray_session):
        import ray.data

        from tableextraction_ray.functions import similarity as S

        rows = self._embs(n=40, seed=11)
        a = sorted(
            (r["vec_id"], r["code_packed"], r["sq_err"])
            for r in S.pq_index_incremental(ray.data.from_items(rows)).take_all()
        )
        b = sorted(
            (r["vec_id"], r["code_packed"], r["sq_err"])
            for r in S.pq_index_incremental(
                ray.data.from_items(rows).repartition(5)
            ).take_all()
        )
        assert a == b and len(a) == 20
