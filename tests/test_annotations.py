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
