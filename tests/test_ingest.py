"""Raw-file ingestion front door + RGB codec/grayzation tests (round-2
verdict missing items 1 and 4)."""

import os

import numpy as np
import pytest

from tableextraction_ray import png
from tableextraction_ray.sources.rasterize import (
    Cv2ImageRasterizer,
    FileRasterizer,
    PdfRasterizer,
    PngRasterizer,
    ingest_files,
)


class TestRgbCodec:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
        out = png.decode_image(png.encode_rgb(img))
        assert out.shape == (20, 31, 3)
        assert np.array_equal(out, img)

    def test_gray_still_roundtrips_via_decode_image(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (10, 10), dtype=np.uint8)
        assert np.array_equal(png.decode_image(png.encode_gray(img)), img)

    def test_decode_gray_converts_rgb(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
        gray = png.decode_gray(png.encode_rgb(img))
        assert np.array_equal(gray, png.grayzation(img))

    def test_grayzation_fixed_point_parity(self):
        # OpenCV BT.601 fixed point: (R*4899 + G*9617 + B*1868 + 8192) >> 14.
        rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]],
                       dtype=np.uint8)
        got = png.grayzation(rgb)[0].tolist()
        assert got == [
            (255 * 4899 + 8192) >> 14,
            (255 * 9617 + 8192) >> 14,
            (255 * 1868 + 8192) >> 14,
            255,
        ]
        # Within 1 of the float formula everywhere.
        rng = np.random.default_rng(10)
        arr = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
        flt = (arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114)
        assert np.abs(png.grayzation(arr).astype(float) - flt).max() <= 1.0


class TestRasterizerGates:
    def test_png_backend_real(self):
        img = np.full((5, 7), 128, dtype=np.uint8)
        pages = PngRasterizer()(png.encode_gray(img))
        assert len(pages) == 1 and np.array_equal(pages[0], img)

    def test_pdf_backend_gated_on_import(self):
        with pytest.raises(NotImplementedError, match="pdf2image"):
            PdfRasterizer()

    def test_cv2_backend_gated_on_import(self):
        with pytest.raises(NotImplementedError, match="cv2"):
            Cv2ImageRasterizer()

    def test_dispatch_lazy_per_kind(self):
        fr = FileRasterizer()
        img = np.full((4, 4), 200, dtype=np.uint8)
        assert len(fr.rasterize("a/b.PNG", png.encode_gray(img))) == 1
        with pytest.raises(NotImplementedError):
            fr.rasterize("doc.pdf", b"%PDF-1.4")
        with pytest.raises(ValueError, match="unsupported media kind"):
            fr.rasterize("notes.txt", b"hello")

    def test_ocr_stage_easyocr_gate_is_import_only(self):
        from tableextraction_ray.stages.ocr_stage import OcrCells

        with pytest.raises(NotImplementedError, match="easyocr"):
            OcrCells(backend="easyocr")


class TestIngestEndToEnd:
    def test_ingest_then_extract(self, ray_session, tmp_path):
        from tableextraction_ray.pipelines.extract import build_extraction_pipeline
        from tableextraction_ray.render import render_page
        from tableextraction_ray.datagen import make_doc_spec

        raw = tmp_path / "raw"
        raw.mkdir()
        # One real rendered table page (gray PNG) + one RGB noise image.
        spec = make_doc_spec(0)
        page_spec = next(p for k, p in spec.spans if k == "media")
        page_img, _ = render_page(page_spec.tables, title=page_spec.title)
        (raw / "report.png").write_bytes(png.encode_gray(page_img))
        # RGB but line-free (blank page): exercises the color decode path
        # without giving the ruling-line detector anything to find.
        blank = np.full((64, 48, 3), 250, dtype=np.uint8)
        (raw / "photo.png").write_bytes(png.encode_rgb(blank))

        corpus = str(tmp_path / "corpus")
        docs = ingest_files(str(raw), corpus)
        docs.write_parquet(os.path.join(corpus, "documents.parquet"))

        # doc_id = stem + path-crc suffix (same-stem disambiguation)
        rows = {r["doc_id"]: r["spans"] for r in docs.take_all()}
        by_stem = {d.split("-")[0]: d for d in rows}
        assert set(by_stem) == {"report", "photo"}
        report = by_stem["report"]
        assert [s["kind"] for s in rows[report]] == ["media"]
        assert os.path.exists(os.path.join(corpus, rows[report][0]["media_ref"]))

        result = {
            r["doc_id"]: r["spans"]
            for r in build_extraction_pipeline(corpus).take_all()
        }
        assert set(result) == set(rows)
        # The rendered table page yields its media marker + text spans; the
        # noise image degrades to a bare marker.
        kinds_report = [s["kind"] for s in result[report]]
        assert kinds_report[0] == "media" and "text" in kinds_report
        assert [s["kind"] for s in result[by_stem["photo"]]] == ["media"]


class TestQueryCli:
    def test_list_and_run(self, ray_session, tmp_path):
        import json
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "tableextraction_ray", "query", "--list"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0
        assert "dedup_exact" in out.stdout and "sql-verified" in out.stdout

        dest = str(tmp_path / "q")
        out = subprocess.run(
            [
                sys.executable, "-m", "tableextraction_ray", "query",
                "fingerprint", "--sf", "/root/testdata/sf0.001", "--out", dest,
            ],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-500:]
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        assert payload["rows"] == 500  # sf0.001 documents


class TestIngestStemCollision:
    def test_same_stem_files_get_distinct_docs(self, ray_session, tmp_path):
        import os

        import numpy as np

        from tableextraction_ray import png
        from tableextraction_ray.sources import ingest_files

        raw = tmp_path / "raw"
        (raw / "a").mkdir(parents=True)
        (raw / "b").mkdir(parents=True)
        img_a = np.full((32, 32), 10, dtype=np.uint8)
        img_b = np.full((32, 32), 240, dtype=np.uint8)
        (raw / "a" / "scan.png").write_bytes(png.encode_gray(img_a))
        (raw / "b" / "scan.png").write_bytes(png.encode_gray(img_b))

        corpus = str(tmp_path / "corpus")
        rows = ingest_files(str(raw), corpus).take_all()
        assert len(rows) == 2
        ids = {r["doc_id"] for r in rows}
        assert len(ids) == 2  # no collision
        refs = {r["spans"][0]["media_ref"] for r in rows}
        assert len(refs) == 2  # distinct media store entries
        payloads = {open(os.path.join(corpus, ref), "rb").read() for ref in refs}
        assert len(payloads) == 2  # neither file overwrote the other


class TestAlternateCorpusFormats:
    def test_jsonl_roundtrip_matches_parquet_schema(self, ray_session, tmp_path):
        import json

        from tableextraction_ray.sources import read_documents, read_documents_jsonl

        lines = [
            {"doc_id": "d1", "spans": [
                {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": "media/d1/p0.png", "offset": 1},
            ]},
            {"doc_id": "d2", "spans": [{"kind": "text", "text": "world"}]},  # defaults
        ]
        f = tmp_path / "docs.jsonl"
        f.write_text("\n".join(json.dumps(x) for x in lines))
        ds = read_documents_jsonl(str(f))
        # schema matches the parquet documents source exactly
        parquet_schema = read_documents("/tmp/graft_corpus/t1").schema()
        # pyarrow names the list child 'item' or 'element' depending on the
        # writer; the types are identical modulo that label.
        norm = lambda ts: [str(t).replace("item:", "element:") for t in ts]
        assert norm(ds.schema().types) == norm(parquet_schema.types)
        rows = {r["doc_id"]: r["spans"] for r in ds.take_all()}
        assert rows["d1"][1]["media_ref"] == "media/d1/p0.png"
        assert rows["d2"][0]["offset"] == 0 and rows["d2"][0]["media_ref"] == ""

    def test_csv_single_span_docs(self, ray_session, tmp_path):
        from tableextraction_ray.sources import read_documents_csv

        f = tmp_path / "docs.csv"
        f.write_text("doc_id,text\na,alpha beta\nb,gamma\n")
        rows = {r["doc_id"]: r["spans"] for r in read_documents_csv(str(f)).take_all()}
        assert rows["a"] == [
            {"kind": "text", "text": "alpha beta", "media_ref": "", "offset": 0}
        ]
        assert rows["b"][0]["text"] == "gamma"


class TestIngestErrorTolerance:
    def test_skip_mode_survives_stray_and_corrupt_files(self, ray_session, tmp_path):
        from tableextraction_ray.sources import ingest_files

        raw = tmp_path / "raw"
        raw.mkdir()
        img = np.full((16, 16), 99, dtype=np.uint8)
        (raw / "good.png").write_bytes(png.encode_gray(img))
        (raw / "notes.txt").write_bytes(b"a stray readme in the crawl tree")
        (raw / "trunc.png").write_bytes(b"\x89PNG\r\n\x1a\n only a header")

        corpus = str(tmp_path / "corpus")
        rows = ingest_files(str(raw), corpus).take_all()  # default on_error='skip'
        assert len(rows) == 1
        assert rows[0]["doc_id"].startswith("good-")

    def test_raise_mode_stays_strict(self, ray_session, tmp_path):
        import ray.exceptions

        from tableextraction_ray.sources import ingest_files

        raw = tmp_path / "raw"
        raw.mkdir()
        (raw / "notes.txt").write_bytes(b"boom")
        corpus = str(tmp_path / "corpus")
        with pytest.raises(Exception, match="unsupported media kind"):
            ingest_files(str(raw), corpus, on_error="raise").take_all()
