"""Simple WKT shape parser — ``geo/SimpleWKTShapeParser.kt`` (OGC
12-063r5 subset): POINT, MULTIPOINT, LINESTRING, MULTILINESTRING,
POLYGON (with holes), MULTIPOLYGON, ENVELOPE, GEOMETRYCOLLECTION, plus
the EMPTY keyword and '#' line comments. Coordinates are WKT-ordered
``lon lat [z]`` (the optional third dimension is parsed and dropped,
SimpleWKTShapeParser.kt:123-131); shapes come back lat-major to match
this package's geo queries.

Shapes are plain tagged tuples:

    ("point", (lat, lon))
    ("multipoint", ((lat, lon), ...))
    ("linestring", ((lat, lon), ...))
    ("multilinestring", (line, ...))
    ("polygon", (ring, (hole, ...)))        ring/hole: ((lat, lon), ...)
    ("multipolygon", (polygon_payload, ...))
    ("envelope", (min_lat, max_lat, min_lon, max_lon))
    ("geometrycollection", (shape, ...))

or ``(tag, None)`` for EMPTY. ``to_query`` lifts a shape onto the
corresponding point query (box / polygon / line / distance-0 semantics).
"""

from __future__ import annotations

import re

__all__ = ["parse", "to_query", "WKTParseError"]


class WKTParseError(ValueError):
    """Malformed WKT (ParseException role)."""


_TOKEN = re.compile(r"""
    \s*(?:
      (?P<comment>\#[^\n]*)
    | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
    | (?P<word>[A-Za-z][A-Za-z0-9]*)
    | (?P<paren>[(),])
    )""", re.X)


def _tokens(wkt: str) -> list[str]:
    out, pos = [], 0
    while pos < len(wkt):
        m = _TOKEN.match(wkt, pos)
        if m is None:
            if wkt[pos:].strip() == "":
                break
            raise WKTParseError(f"unexpected character at {pos}: "
                                f"{wkt[pos:pos + 10]!r}")
        pos = m.end()
        if m.lastgroup != "comment":
            out.append(m.group(m.lastgroup))
    return out


class _Stream:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise WKTParseError("unexpected end of stream")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def number(self) -> float:
        tok = self.next()
        try:
            return float(tok)
        except ValueError:
            raise WKTParseError(f"expected number but found [{tok}]")

    def number_next(self) -> bool:
        nxt = self.peek()
        if nxt is None:
            return False
        return bool(re.match(r"[-+.\d]", nxt))

    def expect(self, want: str) -> None:
        tok = self.next()
        if tok != want:
            raise WKTParseError(f"expected [{want}] but found [{tok}]")

    def empty_or_open(self) -> bool:
        """True if the EMPTY keyword was consumed instead of '('."""
        tok = self.next()
        if tok.upper() == "EMPTY":
            return True
        if tok != "(":
            raise WKTParseError(f"expected [(] or [EMPTY] but found [{tok}]")
        return False

    def closer_or_comma(self) -> str:
        tok = self.next()
        if tok in (")", ","):
            return tok
        raise WKTParseError(f"expected [)] or [,] but found [{tok}]")


def _coordinate(s: _Stream) -> tuple[float, float]:
    lon = s.number()
    lat = s.number()
    if s.number_next():
        s.number()  # optional z, dropped
    return (lat, lon)


def _coordinates(s: _Stream) -> tuple[tuple[float, float], ...]:
    """SimpleWKTShapeParser.kt:95-121 — coordinates optionally wrapped in
    their own parens (MULTIPOINT (1 2, 3 4) or MULTIPOINT ((1 2), (3 4)))."""
    pts: list[tuple[float, float]] = []
    open_paren = False
    if s.number_next():
        pts.append(_coordinate(s))
    elif s.peek() == "(":
        s.next()
        open_paren = True
        pts.append(_coordinate(s))
    while True:
        if open_paren:
            s.expect(")")
            open_paren = False
        if s.closer_or_comma() == ")":
            return tuple(pts)
        if s.number_next():
            pts.append(_coordinate(s))
        elif s.peek() == "(":
            s.next()
            open_paren = True
            pts.append(_coordinate(s))


def _parse_geometry(s: _Stream):
    tag = s.next().lower()
    if tag == "point":
        if s.empty_or_open():
            return ("point", None)
        pt = _coordinate(s)
        s.expect(")")
        return ("point", pt)
    if tag == "multipoint":
        if s.empty_or_open():
            return ("multipoint", None)
        return ("multipoint", _coordinates(s))
    if tag == "linestring":
        if s.empty_or_open():
            return ("linestring", None)
        return ("linestring", _coordinates(s))
    if tag == "multilinestring":
        if s.empty_or_open():
            return ("multilinestring", None)
        lines = [_coordinates_after_open(s)]
        while s.closer_or_comma() == ",":
            lines.append(_coordinates_after_open(s))
        return ("multilinestring", tuple(lines))
    if tag == "polygon":
        if s.empty_or_open():
            return ("polygon", None)
        return ("polygon", _polygon_body(s))
    if tag == "multipolygon":
        if s.empty_or_open():
            return ("multipolygon", None)
        polys = [_polygon_after_open(s)]
        while s.closer_or_comma() == ",":
            polys.append(_polygon_after_open(s))
        return ("multipolygon", tuple(polys))
    if tag == "envelope":
        if s.empty_or_open():
            return ("envelope", None)
        min_lon = s.number()
        s.expect(",")
        max_lon = s.number()
        s.expect(",")
        max_lat = s.number()
        s.expect(",")
        min_lat = s.number()
        s.expect(")")
        return ("envelope", (min_lat, max_lat, min_lon, max_lon))
    if tag == "geometrycollection":
        if s.empty_or_open():
            return ("geometrycollection", None)
        shapes = [_parse_geometry(s)]
        while s.closer_or_comma() == ",":
            shapes.append(_parse_geometry(s))
        return ("geometrycollection", tuple(shapes))
    raise WKTParseError(f"unknown geometry type: [{tag}]")


def _coordinates_after_open(s: _Stream):
    s.expect("(")
    return _coordinates(s)


def _closed_ring(pts):
    """``geo/Polygon.kt`` ctor check (asserted by
    TestSimpleWKTShapeParsing.testPolygonNotClosed)."""
    if len(pts) < 4 or pts[0] != pts[-1]:
        raise WKTParseError(
            "first and last points of the polygon must be the same "
            "(it must close itself)")
    return pts


def _polygon_body(s: _Stream):
    """Already past the polygon's own '(' — shell ring, then hole rings."""
    s.expect("(")
    shell = _closed_ring(_coordinates(s))
    holes = []
    while s.closer_or_comma() == ",":
        s.expect("(")
        holes.append(_closed_ring(_coordinates(s)))
    return (shell, tuple(holes))


def _polygon_after_open(s: _Stream):
    """A MULTIPOLYGON member: consume the member polygon's own '(' first
    (parseMultiPolygon -> parsePolygon -> nextEmptyOrOpen role)."""
    s.expect("(")
    return _polygon_body(s)


def parse(wkt: str):
    """Parse one WKT geometry (SimpleWKTShapeParser.parse role)."""
    s = _Stream(_tokens(wkt))
    shape = _parse_geometry(s)
    if s.peek() is not None:
        raise WKTParseError(f"expected end of stream but found "
                            f"[{s.peek()}]")
    return shape


def to_query(shape_or_wkt, buffer_deg: float = 0.0):
    """Lift a parsed shape (or a WKT string) onto the corresponding
    point query: ENVELOPE -> GeoBoxQuery, POLYGON -> GeoPolygonQuery,
    LINESTRING -> GeoLineQuery(buffer_deg), POINT -> GeoLineQuery over a
    degenerate single-vertex line (exact/buffered point match).
    Multi-shapes and collections OR their members (SHOULD clauses)."""
    from .query import (BooleanQuery, GeoBoxQuery, GeoLineQuery,
                        GeoPolygonQuery, Occur)

    shape = parse(shape_or_wkt) if isinstance(shape_or_wkt, str) \
        else shape_or_wkt
    tag, payload = shape
    if payload is None:
        raise WKTParseError(f"cannot build a query from EMPTY {tag}")
    if tag == "envelope":
        return GeoBoxQuery(*payload)
    if tag == "polygon":
        shell, holes = payload
        return GeoPolygonQuery(shell, holes)
    if tag == "linestring":
        return GeoLineQuery(payload, buffer_deg)
    if tag == "point":
        return GeoLineQuery((payload, payload), buffer_deg)
    if tag == "multipoint":
        return BooleanQuery.build(*[
            (Occur.SHOULD, GeoLineQuery((p, p), buffer_deg))
            for p in payload])
    if tag == "multilinestring":
        return BooleanQuery.build(*[
            (Occur.SHOULD, GeoLineQuery(line, buffer_deg))
            for line in payload])
    if tag == "multipolygon":
        return BooleanQuery.build(*[
            (Occur.SHOULD, GeoPolygonQuery(shell, holes))
            for shell, holes in payload])
    if tag == "geometrycollection":
        return BooleanQuery.build(*[
            (Occur.SHOULD, to_query(member, buffer_deg))
            for member in payload])
    raise WKTParseError(f"unsupported shape: {tag}")
