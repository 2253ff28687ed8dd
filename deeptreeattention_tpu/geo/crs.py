"""Coordinate reference systems: WGS84 UTM <-> geographic.

Implements the transverse Mercator projection (Karney 2011 / Krüger n-series
to order n^6, WGS84 ellipsoid — the same algorithm PROJ's etmerc uses;
nanometer-class within a zone and sub-mm even several zones from the
central meridian) so the pipeline can reproject without PROJ. The only
reprojection the reference performs is UTM 18N -> 17N for BLAN plots
(reference src/data.py:89-98); this supports any UTM<->UTM or
UTM<->EPSG:4326 pair. (Round 3 shipped Snyder 1987 series, whose error
grows to ~0.1 m on cross-zone round trips; replaced in round 4.)
"""
import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_FE = 500000.0  # false easting

# Krüger series in the third flattening n, to n^6 (Karney 2011, eqs. 12/35)
_N = _F / (2 - _F)
_A1 = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)


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
    """lon/lat degrees -> (easting, northing) in the given UTM zone.

    Karney 2011 forward: geodetic -> conformal latitude (exact), then the
    order-n^6 Krüger series maps the conformal sphere onto the transverse
    Mercator plane."""
    lon = np.asarray(lon, float)
    lat = np.asarray(lat, float)
    phi = np.radians(lat)
    # wrap into [-pi, pi): zone 1 (cm -177 deg) must see lon 179 deg as
    # dlam ~ -4 deg, not +356 — the antimeridian-adjacent zones break
    # without this (the series diverges far outside the zone)
    dlam = np.radians(lon) - _central_meridian(zone)
    dlam = (dlam + np.pi) % (2 * np.pi) - np.pi

    sphi = np.sin(phi)
    # tau' = tan(conformal latitude), computed stably via sinh/atanh
    tau = np.tan(phi)
    taup = np.sinh(np.arcsinh(tau) - _E * np.arctanh(_E * sphi))

    xi = np.arctan2(taup, np.cos(dlam))
    eta = np.arcsinh(np.sin(dlam) / np.hypot(taup, np.cos(dlam)))
    xi_s, eta_s = xi, eta
    for j, a in enumerate(_ALPHA, start=1):
        xi_s = xi_s + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_s = eta_s + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    easting = _FE + _K0 * _A1 * eta_s
    northing = _K0 * _A1 * xi_s
    if not north:
        northing = northing + 10000000.0
    return easting, northing


def _tau_from_taup(taup):
    """Invert tau' (conformal) -> tau (geodetic) by Newton (Karney eq. 19-21);
    converges to double precision in <=5 iterations for |lat| < 89.9."""
    e2m = 1 - _E2
    tau = taup / e2m  # first guess
    for _ in range(5):
        s = np.sinh(_E * np.arctanh(_E * tau / np.hypot(1.0, tau)))
        taupa = tau * np.hypot(1.0, s) - s * np.hypot(1.0, tau)
        dtau = ((taup - taupa) * (1 + e2m * tau**2)
                / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa)))
        tau = tau + dtau
    return tau


def utm_to_geographic(easting, northing, zone, north=True):
    """(easting, northing) in a UTM zone -> lon/lat degrees (Karney inverse)."""
    easting = np.asarray(easting, float)
    northing = np.asarray(northing, float)
    y = northing if north else northing - 10000000.0
    xi = y / (_K0 * _A1)
    eta = (easting - _FE) / (_K0 * _A1)

    xi_p, eta_p = xi, eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    tau = _tau_from_taup(taup)
    phi = np.arctan(tau)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam + _central_meridian(zone))
    # wrap to [-180, 180): zone-60 eastings reach past the antimeridian
    lon = (lon + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


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
