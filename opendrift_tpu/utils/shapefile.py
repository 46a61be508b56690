"""Minimal ESRI shapefile reader, from scratch.

The reference reads shapefiles through GDAL/geopandas (reference:
opendrift/models/basemodel/__init__.py:1573-1634, readers/reader_shape.py);
neither is available here.  The .shp format is a simple public binary
layout (ESRI whitepaper, 1998): this module parses Polygon (type 5)
and PolygonZ (15), Point (1) and PolyLine (3) records — everything the
reference's seeding and landmask paths need.
"""

import struct

import numpy as np


def read_shapefile(path):
    """Parse a .shp file.

    Returns a list of shapes; each polygon shape is a dict
    ``{"type": int, "parts": [np.ndarray (n, 2) lon/lat rings]}``.
    """
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[0:4])[0] != 9994:
        raise ValueError(f"{path}: not an ESRI shapefile")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    shapes = []
    offset = 100
    while offset < file_len:
        (_recno, content_len) = struct.unpack(">ii", data[offset:offset + 8])
        offset += 8
        shp_type = struct.unpack("<i", data[offset:offset + 4])[0]
        rec = data[offset:offset + content_len * 2]
        if shp_type in (5, 15, 3, 13):  # Polygon(Z) / PolyLine(Z)
            num_parts, num_points = struct.unpack("<ii", rec[36:44])
            parts = struct.unpack(f"<{num_parts}i", rec[44:44 + 4 *
                                                        num_parts])
            pts_off = 44 + 4 * num_parts
            pts = np.frombuffer(rec, dtype="<f8",
                                count=2 * num_points,
                                offset=pts_off).reshape(-1, 2)
            rings = []
            bounds = list(parts) + [num_points]
            for i in range(num_parts):
                rings.append(pts[bounds[i]:bounds[i + 1]].copy())
            shapes.append({"type": shp_type, "parts": rings})
        elif shp_type == 1:  # Point
            x, y = struct.unpack("<dd", rec[4:20])
            shapes.append({"type": 1,
                           "parts": [np.array([[x, y]])]})
        # type 0 (null) and others: skip
        offset += content_len * 2
    return shapes


def shapefile_polygons(path, to_lonlat=True):
    """All polygon rings from a shapefile as (n, 2) lon/lat arrays.

    When a sibling .prj declares a projected CRS and ``to_lonlat`` is
    True, coordinates are inverse-projected to lon/lat with the
    from-scratch CRS engine."""
    polys = []
    for shape in read_shapefile(path):
        if shape["type"] in (5, 15):
            polys.extend(shape["parts"])
    if to_lonlat:
        import os
        prj = os.path.splitext(path)[0] + ".prj"
        if os.path.exists(prj):
            from .crs import from_esri_wkt
            with open(prj) as f:
                wkt = f.read()
            crs = from_esri_wkt(wkt)
            if not crs.is_latlon:
                out = []
                for ring in polys:
                    lon, lat = crs.inv(np, ring[:, 0], ring[:, 1])
                    out.append(np.column_stack([lon, lat]))
                polys = out
    return polys


def rasterize_polygons(polys, lons, lats):
    """Even-odd rasterisation of polygon rings onto a lon/lat grid.

    Returns a boolean (len(lats), len(lons)) inside-mask.  Uses
    matplotlib's C point-in-polygon routine per ring with even-odd
    combination (outer rings fill, holes unfill) — ESRI ring orientation
    (clockwise outer) is handled by the parity rule.
    """
    from matplotlib.path import Path
    LO, LA = np.meshgrid(lons, lats)
    pts = np.column_stack([LO.ravel(), LA.ravel()])
    inside = np.zeros(pts.shape[0], dtype=int)
    for ring in polys:
        if len(ring) < 3:
            continue
        lo0, la0 = ring.min(axis=0)
        lo1, la1 = ring.max(axis=0)
        sel = ((pts[:, 0] >= lo0) & (pts[:, 0] <= lo1)
               & (pts[:, 1] >= la0) & (pts[:, 1] <= la1))
        if not sel.any():
            continue
        inside[sel] += Path(ring).contains_points(pts[sel])
    return (inside % 2 == 1).reshape(LO.shape)
