"""PascalVOC annotation source tests (reference table_datasets.py:24-56)."""

import os

from tableextraction_ray.sources import parse_pascal_voc, read_pascal_voc

XML = """<annotation>
  <filename>page_{i}.jpg</filename>
  <object><name>table</name>
    <bndbox><xmin>10.7</xmin><ymin>20</ymin><xmax>200</xmax><ymax>300.2</ymax></bndbox>
  </object>
  <object><name>plot</name>
    <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
  </object>
</annotation>"""


class TestParse:
    def test_float_coords_truncate(self):
        rows = parse_pascal_voc(XML.format(i=0).encode())
        assert len(rows) == 2
        assert rows[0] == {
            "filename": "page_0.jpg", "label": "table",
            "xmin": 10, "ymin": 20, "xmax": 200, "ymax": 300,
        }
        assert rows[1]["label"] == "plot"

    def test_empty_annotation(self):
        assert parse_pascal_voc(b"<annotation></annotation>", "x.xml") == []


class TestSource:
    def test_distributed_read(self, tmp_path, ray_session):
        d = tmp_path / "ann"
        d.mkdir()
        for i in range(5):
            (d / f"a{i}.xml").write_text(XML.format(i=i))
        ds = read_pascal_voc(str(d))
        rows = ds.take_all()
        assert len(rows) == 10
        assert {r["filename"] for r in rows} == {f"page_{i}.jpg" for i in range(5)}
        assert {r["label"] for r in rows} == {"table", "plot"}


class TestCoco:
    """COCO surface (reference table_datasets.py:331-455 make_coco +
    createIndex): voc_to_coco mirrors the annotation dict shape; read_coco
    round-trips a sharded COCO json store."""

    def test_voc_to_coco_shape(self, tmp_path, ray_session):
        from tableextraction_ray.sources import read_pascal_voc, voc_to_coco

        d = tmp_path / "ann"
        d.mkdir()
        for i in range(3):
            (d / f"a{i}.xml").write_text(XML.format(i=i))
        # default class map keeps only 'table' (id 0); 'plot' and
        # 'no object' are dropped (class_set.remove semantics).
        rows = voc_to_coco(read_pascal_voc(str(d))).take_all()
        assert len(rows) == 3
        for r in rows:
            assert r["category_id"] == 0
            assert r["width"] == 200 - 10 and r["height"] == 300 - 20
            assert r["area"] == r["width"] * r["height"]
            assert r["iscrowd"] == 0

    def test_ids_stable_and_unique(self, tmp_path, ray_session):
        from tableextraction_ray.sources import read_pascal_voc, voc_to_coco

        d = tmp_path / "ann"
        d.mkdir()
        for i in range(4):
            (d / f"a{i}.xml").write_text(XML.format(i=i))
        cmap = {"table": 0, "plot": 1, "no object": 2}
        a = sorted(
            voc_to_coco(read_pascal_voc(str(d)), class_map=cmap).take_all(),
            key=lambda r: r["ann_id"],
        )
        b = sorted(
            voc_to_coco(read_pascal_voc(str(d)), class_map=cmap).take_all(),
            key=lambda r: r["ann_id"],
        )
        assert a == b  # content-derived ids: stable across runs
        assert len({r["ann_id"] for r in a}) == len(a)
        # one image_id per source image, shared by its two boxes
        per_file = {}
        for r in a:
            per_file.setdefault(r["filename"], set()).add(r["image_id"])
        assert all(len(v) == 1 for v in per_file.values())
        assert len({next(iter(v)) for v in per_file.values()}) == 4

    def test_read_coco_roundtrip(self, tmp_path, ray_session):
        import json

        from tableextraction_ray.sources import read_coco

        d = tmp_path / "coco"
        d.mkdir()
        for shard in range(2):
            doc = {
                "images": [{"id": shard * 10 + 1, "file_name": f"p{shard}.png"}],
                "categories": [{"id": 0}],
                "annotations": [
                    {
                        "id": shard * 100 + j,
                        "image_id": shard * 10 + 1,
                        "category_id": 0,
                        "bbox": [j, 2 * j, 30, 40],
                        "area": 1200,
                        "iscrowd": 0,
                    }
                    for j in range(3)
                ],
            }
            (d / f"shard{shard}.json").write_text(json.dumps(doc))
        rows = read_coco(str(d)).take_all()
        assert len(rows) == 6
        by_img = {}
        for r in rows:
            by_img.setdefault(r["filename"], []).append(r)
        assert set(by_img) == {"p0.png", "p1.png"}
        r0 = sorted(by_img["p0.png"], key=lambda r: r["ann_id"])[0]
        assert (r0["x"], r0["y"], r0["width"], r0["height"], r0["area"]) == (0, 0, 30, 40, 1200)
