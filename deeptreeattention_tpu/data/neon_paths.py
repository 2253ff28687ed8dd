"""NEON tile-path utilities: geoindex lookup, year/site parsing, h5->tif.

Capability parity with reference src/neon_paths.py:9-122 (bounds_to_geoindex,
find_sensor_path, convert_h5, lookup_and_convert, year/site/domain parsers,
elevation_from_tile) with a hardened year parser: NEON organizes tiles under
.../<year>/... and also suffixes converted tifs with the year — we parse the
filename first and fall back to path components, instead of relying on a
fixed split index.
"""
import math
import os
import re


def bounds_to_geoindex(bounds):
    """UTM bounds -> NEON "easting_northing" km-grid geoindex."""
    easting = (bounds[0] + bounds[2]) / 2.0
    northing = (bounds[1] + bounds[3]) / 2.0
    return "{}_{}".format(
        int(math.floor(easting / 1000) * 1000), int(math.floor(northing / 1000) * 1000)
    )


def find_sensor_path(lookup_pool, shapefile=None, bounds=None, geo_index=None, all_years=False):
    """Find tile path(s) in a pool by geoindex; newest-first when single."""
    if not geo_index:
        if shapefile:
            basename = os.path.splitext(os.path.basename(shapefile))[0]
            geo_index = re.search(r"(\d+_\d+)_image", basename).group(1)
        else:
            geo_index = bounds_to_geoindex(bounds)
    matches = [x for x in lookup_pool if geo_index in x]
    if not matches:
        raise ValueError("No matches for geoindex {} in sensor pool".format(geo_index))
    if all_years:
        return matches
    return sorted(matches)[-1]


def year_from_tile(path):
    """Acquisition year from a NEON tile path (filename first, then dirs).

    Only standalone 4-digit years match — lookarounds keep digit runs inside
    UTM coordinates (e.g. northing 3282000, easting 4196000) from being read
    as years; coordinate-only basenames fall through to the year directory
    (the reference's path.split("/")[6], src/neon_paths.py:99-100)."""
    base = os.path.splitext(os.path.basename(path))[0]
    m = re.findall(r"(?<!\d)(?:19|20)\d{2}(?!\d)", base)
    if m:
        return m[-1]
    for part in reversed(path.split(os.sep)):
        if re.fullmatch(r"(19|20)\d{2}", part):
            return part
    raise ValueError("cannot parse year from {}".format(path))


def site_from_path(path):
    basename = os.path.splitext(os.path.basename(path))[0]
    m = re.search(r"NEON_D\d+_(\w+?)_D", basename)
    if m:
        return m.group(1)
    m = re.search(r"_([A-Z]{4})_", basename)
    if m:
        return m.group(1)
    raise ValueError("cannot parse site from {}".format(path))


def domain_from_path(path):
    basename = os.path.splitext(os.path.basename(path))[0]
    return re.search(r"NEON_(D\d+)_\w+_D", basename).group(1)


def elevation_from_tile(path):
    from deeptreeattention_tpu.geo import hdf5

    def read(h5):
        site = list(h5.keys())[0]
        elev = h5[site]["Reflectance"]["Metadata"]["Ancillary_Imagery"][
            "Smooth_Surface_Elevation"
        ][()]
        return float(elev.mean())

    try:
        return hdf5.read_with_fallback(path, read)
    except Exception as e:
        raise IOError("{} failed to read elevation: {}".format(path, e))


def hyperspectral_tif_name(rgb_path, year=None):
    """The single naming rule for converted reflectance tifs — the
    idempotent-resume cache (lookup_and_convert) and the writer
    (convert_h5 -> generate_raster) must agree on this name."""
    suffix = "_{}".format(year) if year else ""
    return (
        os.path.splitext(os.path.basename(rgb_path))[0]
        + "_hyperspectral{}.tif".format(suffix)
    )


def convert_h5(hyperspectral_h5_path, rgb_path, savedir, year=None):
    """h5 reflectance tile -> GeoTIFF named after the RGB tile (+year)."""
    from deeptreeattention_tpu.data import hyperspectral

    written = hyperspectral.generate_raster(
        h5_path=hyperspectral_h5_path,
        rgb_filename=rgb_path,
        suffix=year,
        bands="no_water",
        save_dir=savedir,
    )
    tif_path = os.path.join(savedir, written)
    expected = os.path.join(savedir, hyperspectral_tif_name(rgb_path, year))
    assert tif_path == expected, (
        "converted tif name drifted from the cache key: {} != {}".format(
            tif_path, expected
        )
    )
    return tif_path


def lookup_and_convert(rgb_pool, hyperspectral_pool, savedir, bounds=None,
                       geo_index=None, shapefile=None, all_years=False):
    """Resolve the h5 tile(s) for a geoindex and lazily convert to tif.

    Conversion is cached by output filename (idempotent resume, as in the
    reference's file-existence skips)."""
    h5_path = find_sensor_path(
        shapefile=shapefile, lookup_pool=hyperspectral_pool, bounds=bounds,
        geo_index=geo_index, all_years=all_years,
    )
    rgb_path = find_sensor_path(
        shapefile=shapefile, lookup_pool=rgb_pool, bounds=bounds, geo_index=geo_index
    )

    def convert_one(path, year):
        tif_path = os.path.join(savedir, hyperspectral_tif_name(rgb_path, year))
        if not os.path.exists(tif_path):
            tif_path = convert_h5(path, rgb_path, savedir, year=year)
        return tif_path

    if isinstance(h5_path, list):
        return [convert_one(p, year_from_tile(p)) for p in h5_path]
    return convert_one(h5_path, None)
