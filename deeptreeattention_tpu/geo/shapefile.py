"""ESRI shapefile codec (.shp/.shx/.dbf/.prj) for Point and Polygon layers.

Replaces fiona/pyshp for the vector IO the pipeline performs (crown boxes,
canopy points, tile predictions). Attribute storage is dBase III: character
and numeric fields; None -> empty, matching how the reference's outputs
round-trip through geopandas.to_file (reference src/predict.py:108 etc).
"""
import datetime
import os
import struct

import numpy as np

from deeptreeattention_tpu.geo import crs as crs_mod
from deeptreeattention_tpu.geo.geometry import Box, Point, Polygon, _polygon_or_box

SHP_POINT = 1
SHP_POLYGON = 5


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def read_shapefile(path):
    """Read a shapefile -> (geometries, records:list[dict], epsg or None)."""
    base = os.path.splitext(path)[0]
    geoms = _read_shp(base + ".shp")
    fields, rows = _read_dbf(base + ".dbf") if os.path.exists(base + ".dbf") else ([], [])
    epsg = None
    if os.path.exists(base + ".prj"):
        with open(base + ".prj") as f:
            epsg = crs_mod.epsg_from_wkt(f.read())
    names = [f[0] for f in fields]
    records = [dict(zip(names, row)) if row is not None else None for row in rows]
    if records and len(records) == len(geoms):
        # deleted DBF records (None placeholders) keep positional alignment
        # with .shp shape records; drop both sides together — skipping only
        # the DBF row would attach every later attribute to the wrong crown
        keep = [i for i, r in enumerate(records) if r is not None]
        geoms = [geoms[i] for i in keep]
        records = [records[i] for i in keep]
    else:
        records = [r for r in records if r is not None]
        if records and len(records) != len(geoms):
            records = records[: len(geoms)]
        while len(records) < len(geoms):
            records.append({})
    return geoms, records, epsg


def _read_shp(path):
    with open(path, "rb") as f:
        data = f.read()
    (code,) = struct.unpack(">i", data[:4])
    if code != 9994:
        raise ValueError("{} is not a shapefile".format(path))
    geoms = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        (_recno, length) = struct.unpack(">ii", data[off : off + 8])
        content = data[off + 8 : off + 8 + length * 2]
        off += 8 + length * 2
        if len(content) < 4:
            break
        (stype,) = struct.unpack("<i", content[:4])
        if stype == 0:
            geoms.append(None)
        elif stype in (SHP_POINT, 11, 21):  # Point / PointZ / PointM
            x, y = struct.unpack("<dd", content[4:20])
            geoms.append(Point(x, y))
        elif stype in (SHP_POLYGON, 15, 25, 3, 13, 23):  # (Poly)gon/Z/M, lines
            nparts, npoints = struct.unpack("<ii", content[36:44])
            if nparts == 0 or npoints == 0:
                geoms.append(None)  # legal empty-geometry encoding
                continue
            parts = struct.unpack("<" + "i" * nparts, content[44 : 44 + 4 * nparts])
            pts_off = 44 + 4 * nparts
            pts = np.frombuffer(content, "<f8", count=npoints * 2, offset=pts_off)
            pts = pts.reshape(npoints, 2)
            end = parts[1] if nparts > 1 else npoints
            ring = [tuple(p) for p in pts[parts[0] : end]]  # exterior ring only
            geoms.append(_polygon_or_box(ring))
        else:
            raise ValueError("unsupported shape type {} in {}".format(stype, path))
    return geoms


def _read_dbf(path):
    with open(path, "rb") as f:
        data = f.read()
    nrec, hsize, rsize = struct.unpack("<IHH", data[4:12])
    fields = []
    off = 32
    while off < hsize - 1 and data[off] != 0x0D:
        raw = data[off : off + 32]
        name = raw[:11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    off = hsize
    for _ in range(nrec):
        rec = data[off : off + rsize]
        off += rsize
        if not rec or rec[0:1] == b"*":
            rows.append(None)  # deleted record: keep the slot for alignment
            continue
        pos = 1
        row = []
        for name, ftype, flen, fdec in fields:
            raw = rec[pos : pos + flen]
            pos += flen
            row.append(_parse_dbf_value(raw, ftype, fdec))
        rows.append(row)
    return fields, rows


def _parse_dbf_value(raw, ftype, fdec):
    text = raw.decode("latin-1").strip()
    if ftype in ("N", "F"):
        if text == "" or set(text) <= {"*"}:
            return None
        try:
            return int(text) if fdec == 0 and "." not in text else float(text)
        except ValueError:
            return None
    if ftype == "L":
        return text in ("Y", "y", "T", "t")
    if ftype == "D":
        return text or None
    return text if text != "" else None


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

def write_shapefile(path, geometries, records, epsg=None):
    """Write geometries (all Point, or all Box/Polygon) + record dicts."""
    base = os.path.splitext(path)[0]
    geoms = list(geometries)
    records = [dict(r) for r in records]
    if len(geoms) != len(records):
        raise ValueError("geometry/record count mismatch")

    is_point = all(isinstance(g, Point) for g in geoms if g is not None)
    shp_type = SHP_POINT if is_point and geoms else SHP_POLYGON

    shp_records = []
    for g in geoms:
        if g is None:
            shp_records.append(struct.pack("<i", 0))
        elif shp_type == SHP_POINT:
            shp_records.append(struct.pack("<idd", SHP_POINT, g.x, g.y))
        else:
            ring = _exterior(g)
            npts = len(ring)
            minx, miny, maxx, maxy = g.bounds
            buf = struct.pack("<i4d", SHP_POLYGON, minx, miny, maxx, maxy)
            buf += struct.pack("<iii", 1, npts, 0)
            buf += struct.pack("<" + "dd" * npts, *[c for p in ring for c in p])
            shp_records.append(buf)

    # bbox over all geometries
    bxs = [g.bounds for g in geoms if g is not None]
    if bxs:
        gminx = min(b[0] for b in bxs)
        gminy = min(b[1] for b in bxs)
        gmaxx = max(b[2] for b in bxs)
        gmaxy = max(b[3] for b in bxs)
    else:
        gminx = gminy = gmaxx = gmaxy = 0.0

    shp_len = 100
    shx_body = bytearray()
    shp_body = bytearray()
    for i, rec in enumerate(shp_records):
        shx_body += struct.pack(">ii", shp_len // 2, len(rec) // 2)
        shp_body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
        shp_len += 8 + len(rec)
    shx_body = bytes(shx_body)
    shp_body = bytes(shp_body)

    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, shp_len // 2
    ) + struct.pack("<ii4d4d", 1000, shp_type, gminx, gminy, gmaxx, gmaxy, 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(header + shp_body)
    shx_header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(shx_body)) // 2
    ) + struct.pack("<ii4d4d", 1000, shp_type, gminx, gminy, gmaxx, gmaxy, 0, 0, 0, 0)
    with open(base + ".shx", "wb") as f:
        f.write(shx_header + shx_body)

    _write_dbf(base + ".dbf", records)

    if epsg:
        with open(base + ".prj", "w") as f:
            f.write(crs_mod.wkt_for_epsg(epsg))
    with open(base + ".cpg", "w") as f:
        f.write("ISO-8859-1")
    return path


def _exterior(g):
    if isinstance(g, (Box, Polygon)):
        ring = g.exterior_coords
    else:
        raise ValueError("cannot write {} into polygon layer".format(type(g)))
    # shapefile wants clockwise exterior rings
    area2 = sum(
        (x1 - x0) * (y1 + y0) for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:])
    )
    if area2 < 0:  # counter-clockwise -> reverse
        ring = ring[::-1]
    return ring


def _write_dbf(path, records):
    # infer schema: column order = first-seen; type from values
    columns = []
    for r in records:
        for k in r:
            if k not in columns:
                columns.append(k)
    if not columns:
        columns = ["FID"]
        records = [{"FID": i} for i in range(len(records))]

    fields = []
    used_names = set()
    for c in columns:
        vals = [r.get(c) for r in records]
        vals = [v for v in vals if v is not None and not _is_nan(v)]
        name = str(c)[:10]
        if name in used_names:
            # GDAL-style dedup: two columns sharing a 10-char prefix must
            # not collapse into one field
            for i in range(1, 100):
                suffix = "_{}".format(i)
                cand = str(c)[: 10 - len(suffix)] + suffix
                if cand not in used_names:
                    name = cand
                    break
        used_names.add(name)
        if all(isinstance(v, bool) for v in vals) and vals:
            fields.append((name, "L", 1, 0, c))
        elif all(isinstance(v, (int, np.integer)) and not isinstance(v, bool) for v in vals) and vals:
            width = max([len(str(int(v))) for v in vals] + [1])
            fields.append((name, "N", min(max(width, 10), 19), 0, c))
        elif all(isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(v, bool) for v in vals) and vals:
            fields.append((name, "N", 24, 15, c))
        else:
            width = max([len(_text(v)) for v in vals] + [1])
            fields.append((name, "C", min(max(width, 1), 254), 0, c))

    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    now = datetime.date.today()
    header = struct.pack(
        "<BBBBIHH20x", 0x03, now.year - 1900, now.month, now.day,
        len(records), header_size, record_size,
    )
    body = b""
    for name, ftype, flen, fdec, _src in fields:
        body += struct.pack(
            "<11sc4xBB14x", name.encode("latin-1")[:11], ftype.encode(), flen, fdec
        )
    body += b"\x0d"

    # bytearray, not bytes +=: per-field bytes concatenation is quadratic
    # in file size (measured 60 s for an 8,374-record tile; ~0.1 s now)
    recs = bytearray()
    for r in records:
        recs += b" "
        for name, ftype, flen, fdec, src in fields:
            recs += _format_dbf_value(r.get(src), ftype, flen, fdec)
    with open(path, "wb") as f:
        f.write(header + body + bytes(recs) + b"\x1a")


def _is_nan(v):
    return isinstance(v, float) and v != v


def _text(v):
    if v is None or _is_nan(v):
        return ""
    return str(v)


def _format_dbf_value(v, ftype, flen, fdec):
    if ftype == "L":
        return (b"T" if v else b"F") if v is not None else b"?"
    if ftype == "N":
        if v is None or _is_nan(v):
            return b" " * flen
        if fdec == 0:
            s = "{:d}".format(int(v))
            if len(s) > flen:
                raise ValueError(
                    "integer {} wider than DBF field width {}".format(s, flen)
                )
        else:
            s = "{:.{dec}f}".format(float(v), dec=fdec)
            if len(s) > flen:
                s = "{:.{dec}g}".format(float(v), dec=max(flen - 7, 1))
        s = s.rjust(flen)[:flen]
        return s.encode("latin-1")
    s = _text(v)[:flen].ljust(flen)
    return s.encode("latin-1", "replace")
