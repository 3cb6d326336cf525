"""Converter *config* front-end: parse reference converter definition
files (geomesa-convert/README.md format) and run them as Spark ingest.

The headline test ingests the README's own example config verbatim and
matches a hand-written ConvertSpec row-for-row (VERDICT r3 #4 done
criterion)."""

import hashlib

import pytest

from geomesa_spark.sources.convert import ConvertSpec, delimited_ingest
from geomesa_spark.sources.convert_config import (
    ConverterConfig,
    TransformCompiler,
    delimited_config_ingest,
    json_config_ingest,
    parse_hocon,
    parse_sft,
)

README_CONFIG = """
 converter = {
  type         = "delimited-text",
  format       = "CSV",
  id-field     = "md5($0)",
  fields = [
    { name = "phrase", transform = "concatenate($1, $2)" },
    { name = "lat",    transform = "$4::double" },
    { name = "lon",    transform = "$5::double" },
    { name = "dtg",    transform = "dateHourMinuteSecondMillis($3)" },
    { name = "geom",   transform = "point($lon, $lat)" }
  ]
 }
"""

README_DATA = (
    "first,hello,2015-01-01T00:00:00.000Z,45.0,45.0\n"
    "second,world,2015-01-01T00:00:00.000Z,45.5,46.0\n"
)


def test_parse_hocon_readme():
    cfg = parse_hocon(README_CONFIG)["converter"]
    assert cfg["type"] == "delimited-text"
    assert cfg["id-field"] == "md5($0)"
    assert [f["name"] for f in cfg["fields"]] == [
        "phrase", "lat", "lon", "dtg", "geom",
    ]
    assert cfg["fields"][0]["transform"] == "concatenate($1, $2)"


def test_hocon_comments_and_colons():
    cfg = parse_hocon(
        '# comment\nconverter: { type: "json" // inline\n fields: [] }'
    )
    assert cfg["converter"]["type"] == "json"
    assert cfg["converter"]["fields"] == []


def test_readme_example_matches_handwritten_spec(spark, tmp_path):
    """The done criterion: README config == hand-written spec, row-for-row."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write(README_DATA)

    sft = "phrase:String,dtg:Date,*geom:Point:srid=4326"
    got = (
        delimited_config_ingest(spark, p, README_CONFIG, sft)
        .orderBy("phrase")
        .collect()
    )

    hand = ConvertSpec(
        fields=[
            ("fid", "md5(concat_ws(',', _c0, _c1, _c2, _c3, _c4))"),
            ("phrase", "concat(_c0, _c1)"),
            (
                "dtg",
                "to_timestamp(regexp_replace(_c2, 'Z$', ''), "
                "\"yyyy-MM-dd'T'HH:mm:ss.SSS\")",
            ),
            (
                "geom",
                "named_struct('lon', cast(_c4 as double), "
                "'lat', cast(_c3 as double))",
            ),
        ]
    )
    want = delimited_ingest(spark, p, hand).orderBy("phrase").collect()

    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g.phrase == w.phrase
        assert g.dtg == w.dtg
        assert g.geom.lon == w.geom.lon and g.geom.lat == w.geom.lat
    # id-field = md5($0): $0 is the byte-exact raw record
    line = README_DATA.splitlines()[0]
    assert got[0].fid == hashlib.md5(line.encode()).hexdigest()
    # point() is lon-first per the README ordering note
    assert got[0].geom.lon == 45.0 and got[0].geom.lat == 45.0


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("try('abcd'::int, 0)", 0),
        ("try('1'::int, 0)", 1),
        ("stringToInt('', 0)", 0),
        ("stringToDouble('1.5', 0.0)", 1.5),
        ("substring('foobarbaz', 2, 5)", "oba"),
        ("regexReplace('foo'::r, 'bar', 'foobar')", "barbar"),
        ("capitalize('foo')", "Foo"),
        ("stripQuotes('fo\\\"o')", "foo"),
        ("length('foo')", 3),
        ("concatenate(toString(5), toString(6))", "56"),
        ("lowercase('FOO')", "foo"),
        ("'1'::long", 1),
    ],
)
def test_transform_examples_from_readme(spark, expr, expected):
    """Each README example evaluates to its documented value."""
    sql = TransformCompiler(lambda r: r).compile(expr)
    assert spark.sql(f"select ({sql}) as v").first().v == expected


def test_transform_dates(spark):
    tc = TransformCompiler(lambda r: r)
    for expr, iso in [
        ("basicDate('20150101')", "2015-01-01 00:00:00"),
        ("millisToDate('1449675054462'::long)", None),
        ("dateTime('2015-01-01T00:00:00.000Z')", None),
        ("basicDateTime('20150101T000000.000Z')", None),
        ("basicDateTimeNoMillis('20150101T000000Z')", None),
        ("date('YYYY-MM-dd', '2015-01-01')", "2015-01-01 00:00:00"),
    ]:
        v = spark.sql(f"select ({tc.compile(expr)}) as v").first().v
        assert v is not None, expr
        if iso:
            assert str(v) == iso, expr


def test_parse_list_and_map(spark):
    tc = TransformCompiler(lambda r: r)
    lst_sql = tc.compile("parseList('int', '1, 2, 3')")
    v = spark.sql(f"select ({lst_sql}) as v").first().v
    assert v == [1, 2, 3]
    map_sql = tc.compile("parseMap('int -> string', '1->a,2->b')")
    m = spark.sql(f"select ({map_sql}) as v").first().v
    assert m == {1: "a", 2: "b"}


def test_unsupported_and_unknown_raise():
    tc = TransformCompiler(lambda r: r)
    with pytest.raises(ValueError, match="lineNo"):
        tc.compile("lineNo()")
    with pytest.raises(ValueError, match="unknown transform"):
        tc.compile("definitelyNotAFunction($1)")


def test_forward_field_reference_raises(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("a,1.0\n")
    cfg = """
    converter = {
      type = "delimited-text", format = "CSV",
      fields = [
        { name = "geom", transform = "point($lon, $lon)" },
        { name = "lon",  transform = "$2::double" }
      ]
    }
    """
    with pytest.raises(ValueError, match="before it is defined"):
        delimited_config_ingest(spark, p, cfg, "geom:Point")


def test_drop_invalid_strict_casts(spark, tmp_path):
    """Reference semantics: ::int failures fail the record; our analog
    drops the row under drop_invalid=True."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("a,1\nb,notanint\n")
    cfg = """
    converter = {
      type = "delimited-text", format = "CSV",
      fields = [
        { name = "tag", transform = "$1" },
        { name = "n",   transform = "$2::int" }
      ]
    }
    """
    sft = "tag:String,n:Integer"
    keep = delimited_config_ingest(spark, p, cfg, sft).collect()
    assert len(keep) == 2 and {r.n for r in keep} == {1, None}
    dropped = delimited_config_ingest(spark, p, cfg, sft, drop_invalid=True).collect()
    assert len(dropped) == 1 and dropped[0].tag == "a"


def test_quoted_csv_fields(spark, tmp_path):
    """from_csv honors quoting — the parseList README data shape."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write('23623,Harry,"Will, Mark, Suzan"\n')
    cfg = """
    converter = {
      type = "delimited-text", format = "CSV",
      fields = [
        { name = "id",      transform = "$1::long" },
        { name = "name",    transform = "$2" },
        { name = "friends", transform = "parseList('string', $3)" }
      ]
    }
    """
    r = delimited_config_ingest(
        spark, p, cfg, "id:Long,name:String,friends:List"
    ).first()
    assert r.id == 23623 and r.friends == ["Will", "Mark", "Suzan"]


def test_json_config_ingest_feature_path(spark, tmp_path):
    """README 'Parsing JSON' example: feature-path explode + path fields
    + GeoJSON geometry -> lon/lat struct."""
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write(
            """
            {
              "DataSource": { "name": "myjson" },
              "Features": [
                { "id": 1, "number": 123, "color": " red ",
                  "physical": { "weight": 12.5 },
                  "geometry": { "type": "Point", "coordinates": [55, 56] } },
                { "id": 2, "number": 456, "color": "blue",
                  "physical": { "weight": 2.25 },
                  "geometry": { "type": "Point", "coordinates": [101, 102] } }
              ]
            }
            """
        )
    cfg = """
    converter = {
      type         = "json"
      id-field     = "$id"
      feature-path = "$.Features[*]"
      fields = [
        { name = "id",     json-type = "integer",  path = "$.id", transform = "toString($0)" }
        { name = "number", json-type = "integer",  path = "$.number" }
        { name = "color",  json-type = "string",   path = "$.color", transform = "trim($0)" }
        { name = "weight", json-type = "double",   path = "$.physical.weight" }
        { name = "geom",   json-type = "geometry", path = "$.geometry" }
      ]
    }
    """
    sft = "id:String,number:Integer,color:String,weight:Double,*geom:Point"
    rows = json_config_ingest(spark, p, cfg, sft).orderBy("number").collect()
    assert [r.id for r in rows] == ["1", "2"]
    assert rows[0].number == 123 and rows[0].color == "red"
    assert rows[0].weight == 12.5
    assert (rows[0].geom.lon, rows[0].geom.lat) == (55.0, 56.0)
    assert (rows[1].geom.lon, rows[1].geom.lat) == (101.0, 102.0)
    assert rows[0].fid == "1"


def test_point_from_wkt_column(spark, tmp_path):
    """README: point($2) parses a WKT point column."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write('1,"POINT (2 3)",2015-01-02\n')
    cfg = """
    converter = {
      type = "delimited-text", format = "CSV",
      fields = [ { name = "geom", transform = "point($2)" } ]
    }
    """
    r = delimited_config_ingest(spark, p, cfg, "geom:Point").first()
    assert (r.geom.lon, r.geom.lat) == (2.0, 3.0)


def test_parse_sft():
    assert parse_sft("phrase:String,dtg:Date,*geom:Point:srid=4326") == [
        ("phrase", "string"),
        ("dtg", "timestamp"),
        ("geom", None),
    ]


def test_config_ingest_is_python_free(spark, tmp_path):
    """The compiled plan must contain no Python evaluation — the whole
    transform runs in whole-stage codegen."""
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write(README_DATA)
    df = delimited_config_ingest(
        spark, p, README_CONFIG, "phrase:String,dtg:Date,geom:Point"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regex_literal_keeps_backslash(spark):
    r"""r4 self-review regression: string unescaping must only strip
    the DSL's own escapes (\' \" \\) — a blanket \\(.) -> (.) turned
    the regex literal '\d+'::r into 'd+', so regexReplace removed
    literal "d+" text instead of digit runs."""
    tc = TransformCompiler(lambda r: "'a12b3'" if r == "1" else r)
    sql = tc.compile(r"regexReplace('\d+'::r, 'X', $1)")
    assert spark.sql(f"select ({sql}) as v").first().v == "aXbX"
    # the DSL's own escapes still unescape
    tc2 = TransformCompiler(lambda r: r)
    sql2 = tc2.compile(r"concatenate('it\'s', ' ok')")
    assert spark.sql(f"select ({sql2}) as v").first().v == "it's ok"


def test_delimited_read_options_passed_through(spark, tmp_path):
    """r4 self-review regression: **read_options were declared but
    dropped — a lineSep override (CRLF files) silently left '\\r' in
    the last column, breaking strict casts."""
    p = str(tmp_path / "crlf.csv")
    with open(p, "wb") as f:
        f.write(b"a,1.5\r\nb,2.5\r\n")
    cfg = """
    converter = {
      type = "delimited-text", format = "CSV",
      fields = [
        { name = "tag", transform = "$1" },
        { name = "val", transform = "$2::double" },
      ]
    }
    """
    got = delimited_config_ingest(
        spark, p, cfg, sft="tag:String,val:Double", lineSep="\r\n"
    )
    rows = {(r.tag, r.val) for r in got.collect() if r.tag}
    assert rows == {("a", 1.5), ("b", 2.5)}
