"""Simple GeoJSON polygon parser — ``geo/SimpleGeoJSONPolygonParser.kt``
(the ``Polygon.fromGeoJSON`` entry, ``geo/Polygon.kt:231``).

Accepts a top-level ``Polygon`` / ``MultiPolygon`` geometry, a
``Feature`` wrapping one, or a ``FeatureCollection`` whose single
polygonal feature carries one; any other shape/type errors out.  The
hand-rolled scanner is kept (instead of ``json.loads``) because the
reference parser tolerates trailing commas inside objects — its own
test vectors rely on that — and enforces reference-specific rules:

- coordinates are GeoJSON ``[lon, lat]`` pairs; parsed shapes come back
  lat-major to match this package's geo queries (same convention as
  ``search/wkt.py``);
- a ``crs`` member must be a named OGC CRS84 (``crs.properties.name``
  starting ``urn:ogc:def:crs:OGC`` and ending ``:CRS84``); linked crs
  objects are rejected (``cannot handle linked crs``);
- only ONE polygon geometry may appear (``only one Polygon or
  MultiPolygon is supported``);
- trailing input after the closing brace is an error (``unexpected
  character 'x' after end of GeoJSON object``).

``parse_polygons`` returns ``[(shell, holes), ...]`` with rings as
``((lat, lon), ...)`` tuples — the exact payload ``wkt.to_query`` uses
for polygons — and ``to_query`` lifts the result onto GeoPolygonQuery
(SHOULD-union for MultiPolygon, matching the reference's "union of
polygons" reading).
"""

from __future__ import annotations

__all__ = ["parse_polygons", "to_query", "GeoJSONParseError"]


class GeoJSONParseError(ValueError):
    """Malformed or unsupported GeoJSON (ParseException role)."""


_GEOM_PATHS = ("", "geometry", "features.[].geometry")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.upto = 0
        self.poly_type: str | None = None
        self.coordinates: list | None = None

    # -- scanner ---------------------------------------------------------
    def _err(self, msg: str) -> GeoJSONParseError:
        return GeoJSONParseError(
            f"{msg} at character offset {self.upto}")

    def peek(self) -> str:
        while self.upto < len(self.text) and self.text[self.upto].isspace():
            self.upto += 1
        if self.upto >= len(self.text):
            raise self._err("hit EOF")
        return self.text[self.upto]

    def scan(self, expected: str) -> None:
        ch = self.peek()
        if len(expected) == 1:
            if ch != expected:
                raise self._err(f"expected {expected} but got {ch}")
            self.upto += 1
            return
        if self.text.startswith(expected, self.upto):
            self.upto += len(expected)
        else:
            raise self._err(f"expected {expected}")

    def parse_string(self) -> str:
        self.scan('"')
        out = []
        while self.upto < len(self.text):
            ch = self.text[self.upto]
            self.upto += 1
            if ch == '"':
                return "".join(out)
            if ch == "\\":
                if self.upto >= len(self.text):
                    break
                esc = self.text[self.upto]
                self.upto += 1
                out.append({"n": "\n", "t": "\t", "r": "\r", "b": "\b",
                            "f": "\f", "/": "/", '"': '"',
                            "\\": "\\"}.get(esc, esc))
            else:
                out.append(ch)
        raise self._err("hit EOF inside string")

    def parse_number(self) -> float:
        start = self.upto
        n = len(self.text)
        while self.upto < n and (self.text[self.upto].isdigit()
                                 or self.text[self.upto] in "+-.eE"):
            self.upto += 1
        try:
            return float(self.text[start:self.upto])
        except ValueError:
            raise self._err(
                f"could not parse number {self.text[start:self.upto]!r}")

    # -- values ----------------------------------------------------------
    def parse_value(self, path: str):
        ch = self.peek()
        if ch == "[":
            return self.parse_array(path)
        if ch == "{":
            self.parse_object(path)
            return None
        if ch == '"':
            return self.parse_string()
        if ch == "t":
            self.scan("true")
            return True
        if ch == "f":
            self.scan("false")
            return False
        if ch == "n":
            self.scan("null")
            return None
        if ch == "-" or ch == "." or ch.isdigit():
            return self.parse_number()
        raise self._err("expected array, object, string or literal "
                        f"value, but got: {ch}")

    def parse_array(self, path: str) -> list:
        out: list = []
        self.scan("[")
        while True:
            ch = self.peek()
            if ch == "]":
                self.scan("]")
                return out
            if out:
                if ch != ",":
                    raise self._err("expected ',' separating list items, "
                                    f"but got '{ch}'")
                self.upto += 1
            out.append(self.parse_value(path + ".[]" if path else "[]"))

    def parse_object(self, path: str) -> None:
        self.scan("{")
        first = True
        while True:
            ch = self.peek()
            if ch == "}":
                break
            if not first:
                if ch != ",":
                    raise self._err(f"expected , but got {ch}")
                self.upto += 1
                if self.peek() == "}":   # trailing comma tolerated,
                    break                # exactly as the reference
            first = False
            key = self.parse_string()
            self.scan(":")
            upto_start = self.upto
            if path == "crs" and key == "type":
                o = self.parse_value("")
                if o == "link":
                    self.upto = upto_start
                    raise self._err("cannot handle linked crs")
                continue
            sub = f"{path}.{key}" if path else key
            o = self.parse_value(sub)
            if path == "crs.properties" and key == "name":
                if not isinstance(o, str):
                    self.upto = upto_start
                    raise self._err("crs.properties.name should be a "
                                    f"string, but saw: {o}")
                if not (o.startswith("urn:ogc:def:crs:OGC")
                        and o.endswith(":CRS84")):
                    self.upto = upto_start
                    raise self._err(f"crs must be CRS84 from OGC, "
                                    f"but saw: {o}")
            if key == "type" and not path.startswith("crs"):
                if not isinstance(o, str):
                    self.upto = upto_start
                    raise self._err(f"type should be a string, but got: {o}")
                if o == "Polygon" and path in _GEOM_PATHS:
                    self.poly_type = "Polygon"
                elif o == "MultiPolygon" and path in _GEOM_PATHS:
                    self.poly_type = "MultiPolygon"
                elif o in ("FeatureCollection", "Feature") \
                        and path in ("features.[]", ""):
                    pass  # recurse
                else:
                    self.upto = upto_start
                    raise self._err(
                        "can only handle type FeatureCollection (if it has "
                        "a single polygon geometry), Feature, Polygon or "
                        f"MultiPolygon, but got {o}")
            elif key == "coordinates" and path in _GEOM_PATHS:
                if not isinstance(o, list):
                    self.upto = upto_start
                    raise self._err("coordinates should be an array, "
                                    f"but got: {type(o).__name__}")
                if self.coordinates is not None:
                    self.upto = upto_start
                    raise self._err(
                        "only one Polygon or MultiPolygon is supported")
                self.coordinates = o
        self.scan("}")

    def read_end(self) -> None:
        while self.upto < len(self.text):
            ch = self.text[self.upto]
            if not ch.isspace():
                raise self._err(f"unexpected character '{ch}' after end "
                                "of GeoJSON object")
            self.upto += 1

    # -- polygon assembly --------------------------------------------------
    def _points(self, arr) -> tuple:
        pts = []
        for p in arr:
            if not isinstance(p, list):
                raise self._err("elements of coordinates array must "
                                f"[lat, lon] array, but got: {p}")
            if len(p) != 2:
                raise self._err(
                    "elements of coordinates array must [lat, lon] array, "
                    f"but got wrong element count: {p}")
            if not isinstance(p[0], float) or not isinstance(p[1], float):
                raise self._err(
                    "elements of coordinates array must [lat, lon] array "
                    f"of numbers: {p}")
            pts.append((p[1], p[0]))   # lon, lat ordering in GeoJSON!
        return tuple(pts)

    def _polygon(self, rings) -> tuple:
        if not rings or not isinstance(rings[0], list):
            raise self._err(
                "first element of polygon array must be an array "
                "[[lat, lon], [lat, lon] ...] but got: "
                f"{rings[0] if rings else rings}")
        shell = self._points(rings[0])
        holes = []
        for ring in rings[1:]:
            if not isinstance(ring, list):
                raise self._err(
                    "elements of coordinates array must be an array "
                    f"[[lat, lon], [lat, lon] ...] but got: {ring}")
            holes.append(self._points(ring))
        return shell, tuple(holes)

    def parse(self) -> list[tuple]:
        self.parse_object("")
        self.read_end()
        if self.coordinates is None:
            raise self._err("did not see any polygon coordinates")
        if self.poly_type is None:
            raise self._err("did not see type: Polygon or MultiPolygon")
        if self.poly_type == "Polygon":
            return [self._polygon(self.coordinates)]
        out = []
        for member in self.coordinates:
            if not isinstance(member, list):
                raise self._err("elements of coordinates array should be "
                                f"an array, but got: {type(member).__name__}")
            out.append(self._polygon(member))
        return out


def parse_polygons(geojson: str) -> list[tuple]:
    """``Polygon.fromGeoJSON`` role: GeoJSON → ``[(shell, holes), ...]``
    with rings as ``((lat, lon), ...)`` tuples."""
    return _Parser(geojson).parse()


def to_query(geojson: str):
    """Parse and lift onto the point-query surface: one polygon →
    GeoPolygonQuery(shell, holes); MultiPolygon → SHOULD-union."""
    from .query import BooleanQuery, GeoPolygonQuery, Occur

    polys = parse_polygons(geojson)
    if len(polys) == 1:
        shell, holes = polys[0]
        return GeoPolygonQuery(shell, holes)
    return BooleanQuery.build(*[
        (Occur.SHOULD, GeoPolygonQuery(shell, holes))
        for shell, holes in polys])
