"""SHP/GML export round-trips via spec-based mini-readers."""

import struct
import xml.etree.ElementTree as ET

import pytest


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        [
            ("a", 10.25, -5.5, 3, 1.5),
            ("b", -120.0, 45.125, 7, -2.25),
            ("c", 0.0, 0.0, -1, 0.0),
        ],
        "doc_id string, lon double, lat double, n long, v double",
    )


def _read_shp_points(path):
    data = open(path, "rb").read()
    (code,) = struct.unpack(">i", data[:4])
    assert code == 9994
    (length_words,) = struct.unpack(">i", data[24:28])
    assert length_words * 2 == len(data)
    version, shape_type = struct.unpack("<ii", data[28:36])
    assert (version, shape_type) == (1000, 1)
    bbox = struct.unpack("<4d", data[36:68])
    pts, off = [], 100
    while off < len(data):
        recno, words = struct.unpack(">ii", data[off : off + 8])
        st, x, y = struct.unpack("<idd", data[off + 8 : off + 8 + words * 2])
        assert st == 1
        pts.append((x, y))
        off += 8 + words * 2
    return bbox, pts


def _read_dbf(path):
    data = open(path, "rb").read()
    nrec, hdr, rsize = struct.unpack("<IHH", data[4:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].rstrip(b"\x00").decode()
        typ = chr(data[off + 11])
        length = data[off + 16]
        fields.append((name, typ, length))
        off += 32
    rows = []
    off = hdr
    for _ in range(nrec):
        rec = data[off : off + rsize]
        assert rec[0:1] == b" "
        vals, p = {}, 1
        for name, typ, length in fields:
            raw = rec[p : p + length]
            vals[name] = raw.decode("utf-8", "replace").strip()
            p += length
        rows.append(vals)
        off += rsize
    return fields, rows


def test_shp_roundtrip(spark, small_df, tmp_path):
    from geomesa_spark.sources.export import export_shp

    base = str(tmp_path / "pts")
    export_shp(small_df, base)
    bbox, pts = _read_shp_points(base + ".shp")
    src = small_df.collect()
    assert pts == [(r.lon, r.lat) for r in src]
    assert bbox == (-120.0, -5.5, 10.25, 45.125)
    fields, rows = _read_dbf(base + ".dbf")
    assert [f[0] for f in fields] == ["doc_id", "n", "v"]
    assert [r["doc_id"] for r in rows] == ["a", "b", "c"]
    assert [int(r["n"]) for r in rows] == [3, 7, -1]
    assert [float(r["v"]) for r in rows] == [1.5, -2.25, 0.0]
    # shx: one index entry per record
    shx = open(base + ".shx", "rb").read()
    assert (len(shx) - 100) // 8 == 3


def test_gml_roundtrip(spark, small_df, tmp_path):
    from geomesa_spark.sources.export import export_gml

    p = str(tmp_path / "f.gml")
    export_gml(small_df, p)
    root = ET.parse(p).getroot()
    ns = {"gml": "http://www.opengis.net/gml", "gs": "urn:geomesa-spark:features"}
    members = root.findall("gml:featureMember", ns)
    assert len(members) == 3
    feats = {}
    for m in members:
        f = m.find("gs:feature", ns)
        coords = f.find("gs:geom/gml:Point/gml:coordinates", ns).text
        feats[f.get("fid")] = (coords, f.find("gs:n", ns).text)
    assert feats["a"] == ("10.25,-5.5", "3")
    assert feats["b"][0] == "-120.0,45.125"
