"""SimpleGeoJSONPolygonParser parity — the reference's TestPolygon.kt
GeoJSON vectors (testGeoJSONPolygon .. testIllegalGeoJSONMultipleFeatures),
including the trailing-comma tolerance its own vectors rely on."""

import pytest

from lucene_kmp_ray.search.geojson import (GeoJSONParseError,
                                           parse_polygons, to_query)

QUAD = ("[ [100.0, 0.0], [101.0, 0.0], [101.0, 1.0], "
        "[100.0, 1.0], [100.0, 0.0] ]")
QUAD_RING = ((0.0, 100.0), (0.0, 101.0), (1.0, 101.0),
             (1.0, 100.0), (0.0, 100.0))
QUAD2 = "[ [10.0, 2.0], [11.0, 2.0], [11.0, 3.0], [10.0, 3.0], [10.0, 2.0] ]"
QUAD2_RING = ((2.0, 10.0), (2.0, 11.0), (3.0, 11.0),
              (3.0, 10.0), (2.0, 10.0))


def test_polygon():                              # testGeoJSONPolygon
    p = parse_polygons(
        '{ "type": "Polygon", "coordinates": [ %s ] }' % QUAD)
    assert p == [(QUAD_RING, ())]


def test_polygon_with_hole():                    # testGeoJSONPolygonWithHole
    hole = ("[ [100.5, 0.5], [100.5, 0.75], [100.75, 0.75], "
            "[100.75, 0.5], [100.5, 0.5] ]")
    p = parse_polygons('{ "type": "Polygon", "coordinates": [ %s, %s ] }'
                       % (QUAD, hole))
    assert p == [(QUAD_RING, (((0.5, 100.5), (0.75, 100.5), (0.75, 100.75),
                               (0.5, 100.75), (0.5, 100.5)),))]


def test_multipolygon_trailing_comma():          # testGeoJSONMultiPolygon
    p = parse_polygons('{ "type": "MultiPolygon", "coordinates": '
                       '[ [ %s ], [ %s ] ], }' % (QUAD, QUAD2))
    assert p == [(QUAD_RING, ()), (QUAD2_RING, ())]


def test_type_comes_last():                      # testGeoJSONTypeComesLast
    p = parse_polygons('{ "coordinates": [ %s ], "type": "Polygon", }'
                       % QUAD)
    assert p == [(QUAD_RING, ())]


def test_feature():                              # testGeoJSONPolygonFeature
    p = parse_polygons(
        '{ "type": "Feature", "geometry": { "type": "Polygon", '
        '"coordinates": [ %s ] }, "properties": { "prop0": "value0", '
        '"prop1": {"this": "that"} } }' % QUAD)
    assert p == [(QUAD_RING, ())]


def test_multipolygon_feature():           # testGeoJSONMultiPolygonFeature
    p = parse_polygons(
        '{ "type": "Feature", "geometry": { "type": "MultiPolygon", '
        '"coordinates": [ [ %s ], [ %s ] ] }, "properties": {} }'
        % (QUAD, QUAD2))
    assert p == [(QUAD_RING, ()), (QUAD2_RING, ())]


def test_feature_collection_single_polygon():
    p = parse_polygons(
        '{ "type": "FeatureCollection", "features": [ '
        '{ "type": "Feature", "geometry": { "type": "Polygon", '
        '"coordinates": [ %s ] }, "properties": {} } ] }   ' % QUAD)
    assert p == [(QUAD_RING, ())]


def test_extra_crap_at_end():            # testIllegalGeoJSONExtraCrapAtEnd
    with pytest.raises(GeoJSONParseError,
                       match="unexpected character 'f' after end"):
        parse_polygons('{ "type": "Polygon", "coordinates": [ %s ] }\nfoo'
                       % QUAD)


def test_linked_crs_rejected():             # testIllegalGeoJSONLinkedCRS
    with pytest.raises(GeoJSONParseError, match="cannot handle linked crs"):
        parse_polygons(
            '{ "type": "Polygon", "coordinates": [ %s ], "crs": '
            '{ "type": "link", "properties": { "href": '
            '"http://example.com/crs/42", "type": "proj4" } } }' % QUAD)


def test_named_crs84_accepted():
    p = parse_polygons(
        '{ "type": "Polygon", "coordinates": [ %s ], "crs": '
        '{ "type": "name", "properties": '
        '{ "name": "urn:ogc:def:crs:OGC:1.3:CRS84" } } }' % QUAD)
    assert p == [(QUAD_RING, ())]


def test_other_crs_rejected():
    with pytest.raises(GeoJSONParseError, match="crs must be CRS84"):
        parse_polygons(
            '{ "type": "Polygon", "coordinates": [ %s ], "crs": '
            '{ "type": "name", "properties": { "name": "EPSG:3857" } } }'
            % QUAD)


def test_non_polygonal_type_rejected():  # testIllegalGeoJSONMultipleFeatures
    with pytest.raises(GeoJSONParseError, match="can only handle type"):
        parse_polygons(
            '{ "type": "FeatureCollection", "features": [ { "type": '
            '"Feature", "geometry": {"type": "Point", "coordinates": '
            '[102.0, 0.5]}, "properties": {} } ] }')


def test_two_geometries_rejected():
    with pytest.raises(GeoJSONParseError,
                       match="only one Polygon or MultiPolygon"):
        parse_polygons(
            '{ "type": "FeatureCollection", "features": [ '
            '{ "type": "Feature", "geometry": { "type": "Polygon", '
            '"coordinates": [ %s ] }, "properties": {} }, '
            '{ "type": "Feature", "geometry": { "type": "Polygon", '
            '"coordinates": [ %s ] }, "properties": {} } ] }'
            % (QUAD, QUAD2))


def test_missing_type_rejected():
    with pytest.raises(GeoJSONParseError,
                       match="did not see type"):
        parse_polygons('{ "coordinates": [ %s ] }' % QUAD)


def test_missing_coordinates_rejected():
    with pytest.raises(GeoJSONParseError,
                       match="did not see any polygon coordinates"):
        parse_polygons('{ "type": "Polygon" }')


def test_to_query_shapes():
    from lucene_kmp_ray.search.query import BooleanQuery, GeoPolygonQuery
    q = to_query('{ "type": "Polygon", "coordinates": [ %s ] }' % QUAD)
    assert isinstance(q, GeoPolygonQuery)
    q = to_query('{ "type": "MultiPolygon", "coordinates": '
                 '[ [ %s ], [ %s ] ] }' % (QUAD, QUAD2))
    assert isinstance(q, BooleanQuery)
