"""Geo queries: zl:geo distance, zl:geoBbox box (incl. antimeridian
crossing), geodist sort — ZuliaGeoDistanceQueryNode /
ZuliaGeoBboxQueryNode → LatLonPoint.newDistanceQuery / newBoxQuery;
sort branch ShardReader.buildSortFromSortRequest:618-640."""

import math

import pandas as pd
import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.indexing.builder import build_index
from zuliasearch_spark.search.executor import SearchEngine, _EARTH_RADIUS_M
from zuliasearch_spark.search.parser import ParseError, ZlGeo, parse_query
from zuliasearch_spark.search.query import QueryClause as C
from zuliasearch_spark.search.query import SearchRequest

# (uid, text, [lat, lon])
POINTS = [
    ("boston", "x city", [42.36, -71.06]),
    ("nyc", "x city", [40.71, -74.01]),
    ("london", "x city", [51.51, -0.13]),
    ("tokyo", "x city", [35.68, 139.69]),
    ("sydney", "x city", [-33.87, 151.21]),
    ("fiji_w", "x island", [-17.8, 178.0]),
    ("fiji_e", "x island", [-17.8, -179.5]),
    ("nogeo", "x nowhere", None),
]


def hav_km(a, b):
    la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    h = math.sin((la2 - la1) / 2) ** 2 + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    return 2 * _EARTH_RADIUS_M * math.asin(math.sqrt(h)) / 1000.0


@pytest.fixture(scope="module")
def geo_eng(spark):
    cfg = IndexConfig(
        index_name="geo",
        unique_id_col="uniqueId",
        number_of_shards=2,
        default_search_fields=("content",),
        field_configs=(
            FieldConfig("content", index_as=(IndexAs("content", "whitespace_lc"),)),
        ),
    )
    pdf = pd.DataFrame(POINTS, columns=["uniqueId", "content", "loc"])
    tables = build_index(spark.createDataFrame(pdf), cfg, stored_cols=("loc",)).persist()
    yield SearchEngine(tables)
    tables.unpersist()


def _ids(eng, qs):
    res = eng.search_string(qs, amount=20)
    return sorted(t["uniqueId"] for t in res["topk"])


def test_geo_distance_query(geo_eng):
    # 350 km around Boston: includes NYC (~306 km), nothing else
    got = _ids(geo_eng, "content:x AND zl:geo(loc 42.36 -71.06 350)")
    assert got == ["boston", "nyc"]
    pts = dict((u, p) for u, _, p in POINTS if p)
    assert hav_km(pts["boston"], pts["nyc"]) < 350 < hav_km(pts["boston"], pts["london"])


def test_geo_bbox_query(geo_eng):
    got = _ids(geo_eng, "content:x AND zl:geoBbox(loc 35 55 -80 10)")
    assert got == ["boston", "london", "nyc"]
    # field-prefix form parses the same query
    got2 = _ids(geo_eng, "content:x AND loc:zl:geoBbox(35 55 -80 10)")
    assert got2 == got


def test_geo_bbox_antimeridian(geo_eng):
    # minLon > maxLon crosses the dateline: both Fiji points, Tokyo out
    got = _ids(geo_eng, "content:x AND zl:geoBbox(loc -30 0 170 -170)")
    assert got == ["fiji_e", "fiji_w"]


def test_geo_must_not_keeps_missing(geo_eng):
    # Lucene MUST_NOT: the doc without the geo field is kept
    got = _ids(geo_eng, "content:x AND NOT zl:geoBbox(loc -90 90 -180 180)")
    assert got == ["nogeo"]


def test_geo_sort(geo_eng):
    req = SearchRequest((C("FILTER", q="content:city"),), amount=10)
    rows = geo_eng.geo_sort(req, "loc", 42.36, -71.06, amount=10).collect()
    order = [r["uniqueId"] for r in rows]
    assert order[:2] == ["boston", "nyc"]
    dists = [r["geo_dist_m"] for r in rows if r["geo_dist_m"] is not None]
    assert dists == sorted(dists)
    assert abs(dists[1] / 1000.0 - hav_km([42.36, -71.06], [40.71, -74.01])) < 0.01


def test_geo_parse_shapes():
    root = parse_query("zl:geo(loc 42.36 -71.06 350)")
    _, node = root.children[0]
    assert isinstance(node, ZlGeo) and node.kind == "geo"
    assert node.field == "loc" and node.args == (42.36, -71.06, 350.0)
    root = parse_query("zl:geoBbox(loc -30 0 170 -170)")
    _, node = root.children[0]
    assert node.kind == "geo_bbox" and node.args == (-30.0, 0.0, 170.0, -170.0)
    with pytest.raises(ParseError):
        parse_query("zl:geo(loc 1 2)")  # too few numbers
    with pytest.raises(ParseError):
        parse_query("zl:ns(1 2)")  # ns still needs a field prefix


def test_geodist_in_score_function(geo_eng):
    """geodist(field, lat, lon) in scoreFunction expressions rewrites
    to haversine km, like the reference's GeoDistanceValuesSource /
    1000 binding (ZuliaIndex.java:841-864): nearer docs re-rank
    higher via 1/(1+d)."""
    req = SearchRequest((C("FILTER", q="content:city"),), amount=10)
    rows = geo_eng.search_score_function(
        req, "1.0 / (1.0 + geodist(loc, 42.36, -71.06))", amount=10
    ).collect()
    order = [r["uniqueId"] for r in rows]
    assert order[:2] == ["boston", "nyc"]
    d_km = hav_km([42.36, -71.06], [40.71, -74.01])
    got = [r["fscore"] for r in rows if r["uniqueId"] == "nyc"][0]
    assert abs(got - 1.0 / (1.0 + d_km)) < 1e-6
