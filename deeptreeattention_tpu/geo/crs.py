"""Coordinate reference systems: WGS84 UTM <-> geographic.

Implements the transverse Mercator projection (Snyder 1987 series, WGS84
ellipsoid; sub-mm accuracy within a UTM zone) so the pipeline can reproject
without PROJ. The only reprojection the reference performs is UTM 18N -> 17N
for BLAN plots (reference src/data.py:89-98); this supports any UTM<->UTM or
UTM<->EPSG:4326 pair.
"""
import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_FE = 500000.0  # false easting


def utm_zone_epsg(zone, north=True):
    return (32600 if north else 32700) + int(zone)


def normalize_epsg(value):
    """Coerce a user-facing CRS spec to an integer EPSG code.

    rasterio/geopandas users write ``crs="EPSG:32617"``, ``crs=32617``, or
    pass a pyproj/rasterio ``CRS`` object; the in-house geo engine keys
    everything off the integer code. Accepts ints, numeric strings,
    ``"EPSG:NNNN"`` (any case), and objects exposing ``to_epsg()``.
    ``None`` passes through (unset CRS).
    """
    if value is None:
        return None
    if isinstance(value, (int, np.integer)):
        return int(value)
    if isinstance(value, (float, np.floating)):
        # EPSG codes read from pandas float columns (e.g. 32617.0)
        if float(value).is_integer():
            return int(value)
        raise ValueError("non-integral EPSG code: {!r}".format(value))
    to_epsg = getattr(value, "to_epsg", None)
    if callable(to_epsg):
        code = to_epsg()
        if code is None:
            raise ValueError("CRS object has no EPSG code: {!r}".format(value))
        return int(code)
    s = str(value).strip()
    if ":" in s:  # "EPSG:32617" / "epsg:4326"
        auth, _, tail = s.partition(":")
        if auth.strip().upper() != "EPSG":
            raise ValueError("unsupported CRS authority: {!r}".format(value))
        s = tail
    try:
        return int(s)
    except ValueError:
        raise ValueError("cannot parse CRS spec: {!r}".format(value))


def parse_utm_epsg(epsg):
    """(zone, north) for WGS84 (326xx/327xx) and NAD83 (269xx) UTM codes.

    NAD83's GRS80 ellipsoid is numerically indistinguishable from WGS84 for
    this pipeline's meter-level math (flattening differs in the 9th digit);
    the zone geometry is what matters here. A true datum shift would need a
    grid transformation, which no reference workflow uses."""
    if 26901 <= int(epsg) <= 26923:
        return int(epsg) - 26900, True
    epsg = int(epsg)
    if 32601 <= epsg <= 32660:
        return epsg - 32600, True
    if 32701 <= epsg <= 32760:
        return epsg - 32700, False
    raise ValueError("EPSG {} is not a WGS84 UTM zone".format(epsg))


def _central_meridian(zone):
    return math.radians(-183.0 + 6.0 * zone)


def geographic_to_utm(lon, lat, zone, north=True):
    """lon/lat degrees -> (easting, northing) in the given UTM zone."""
    lon = np.asarray(lon, float)
    lat = np.asarray(lat, float)
    lam = np.radians(lon)
    phi = np.radians(lat)
    lam0 = _central_meridian(zone)

    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    tan_phi = np.tan(phi)
    N = _A / np.sqrt(1 - _E2 * sin_phi**2)
    T = tan_phi**2
    C = _EP2 * cos_phi**2
    Aa = (lam - lam0) * cos_phi

    # meridional arc
    M = _A * (
        (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256) * phi
        - (3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024) * np.sin(2 * phi)
        + (15 * _E2**2 / 256 + 45 * _E2**3 / 1024) * np.sin(4 * phi)
        - (35 * _E2**3 / 3072) * np.sin(6 * phi)
    )

    easting = _FE + _K0 * N * (
        Aa + (1 - T + C) * Aa**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * _EP2) * Aa**5 / 120
    )
    northing = _K0 * (
        M
        + N
        * tan_phi
        * (
            Aa**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * Aa**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * _EP2) * Aa**6 / 720
        )
    )
    if not north:
        northing = northing + 10000000.0
    return easting, northing


def utm_to_geographic(easting, northing, zone, north=True):
    """(easting, northing) in a UTM zone -> lon/lat degrees."""
    easting = np.asarray(easting, float)
    northing = np.asarray(northing, float)
    x = easting - _FE
    y = northing if north else northing - 10000000.0
    lam0 = _central_meridian(zone)

    M = y / _K0
    mu = M / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )

    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    C1 = _EP2 * cos1**2
    T1 = tan1**2
    N1 = _A / np.sqrt(1 - _E2 * sin1**2)
    R1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    D = x / (N1 * _K0)

    phi = phi1 - (N1 * tan1 / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * _EP2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * _EP2 - 3 * C1**2) * D**6 / 720
    )
    lam = lam0 + (
        D - (1 + 2 * T1 + C1) * D**3 / 6 + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * _EP2 + 24 * T1**2) * D**5 / 120
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


def transform_xy(x, y, src_epsg, dst_epsg):
    """Transform coordinate arrays between EPSG:4326 and/or WGS84 UTM zones."""
    src_epsg, dst_epsg = int(src_epsg), int(dst_epsg)
    if src_epsg == dst_epsg:
        return np.asarray(x, float), np.asarray(y, float)
    if src_epsg == 4326:
        lon, lat = np.asarray(x, float), np.asarray(y, float)
    else:
        zone, north = parse_utm_epsg(src_epsg)
        lon, lat = utm_to_geographic(x, y, zone, north)
    if dst_epsg == 4326:
        return lon, lat
    zone, north = parse_utm_epsg(dst_epsg)
    return geographic_to_utm(lon, lat, zone, north)


def wkt_for_epsg(epsg):
    """ESRI-style WKT for .prj files (UTM WGS84 zones and EPSG:4326)."""
    epsg = int(epsg)
    if epsg == 4326:
        return (
            'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
            "6378137.0,298.257223563]],PRIMEM[\"Greenwich\",0.0],"
            'UNIT["Degree",0.0174532925199433]]'
        )
    zone, north = parse_utm_epsg(epsg)
    hemi = "N" if north else "S"
    fn = 0.0 if north else 10000000.0
    cm = -183.0 + 6.0 * zone
    return (
        'PROJCS["WGS_1984_UTM_Zone_{z}{h}",GEOGCS["GCS_WGS_1984",'
        'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
        'PARAMETER["False_Northing",{fn}],PARAMETER["Central_Meridian",{cm}],'
        'PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],'
        'UNIT["Meter",1.0]]'
    ).format(z=zone, h=hemi, fn=fn, cm=cm)


def epsg_from_wkt(text):
    """Best-effort EPSG recovery from .prj WKT (UTM zones + 4326)."""
    import re

    if not text:
        return None
    m = re.search(r"UTM[_ ]Zone[_ ](\d+)(N|S)", text, re.IGNORECASE)
    if m:
        zone, north = int(m.group(1)), m.group(2).upper() == "N"
        # the datum decides the EPSG family — mapping a NAD83 zone to the
        # WGS84 code would shift every coordinate by the ~1-2 m datum offset
        if "NAD_1983" in text or "NAD83" in text or "North_American_1983" in text:
            if north:
                return 26900 + zone
            raise ValueError("NAD83 UTM south zone has no EPSG 269xx code")
        if "WGS" in text or "D_WGS_1984" in text or "GCS_WGS_1984" in text:
            return utm_zone_epsg(zone, north)
        raise ValueError(
            "unrecognized datum for UTM zone in WKT (not WGS84/NAD83): "
            "{}...".format(text[:80])
        )
    m = re.search(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]\s*\]\s*$', text)
    if m:
        return int(m.group(1))
    if "GCS_WGS_1984" in text or "WGS 84" in text:
        return 4326
    return None
