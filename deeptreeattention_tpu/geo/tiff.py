"""GeoTIFF codec (pure numpy baseline; native/ supplies a C++ fast path).

Replaces rasterio/GDAL for this framework's raster IO. Supports the subset of
TIFF 6.0 the pipeline needs:

  read:  classic TIFF, little/big endian, striped or tiled, chunky (pixel
         interleaved) or planar, compression none/deflate/packbits/LZW,
         horizontal-differencing predictor, uint8/16/32, int16/32,
         float32/64, multi-IFD (first image), GeoTIFF georeferencing tags.
  write: striped or tiled, chunky or planar, none/deflate, GeoTIFF tags
         (ModelPixelScale + ModelTiepoint + EPSG GeoKey).

Windowed reads decode only the strips/tiles intersecting the window — the
property the tile-prediction hot loop depends on (reference reads 11x11
windows out of ~700MB HSI tiles via rasterio; see reference src/patches.py).
"""
import os
import struct
import zlib

import numpy as np

from deeptreeattention_tpu.geo.affine import Affine, Window

# TIFF tag ids
T_WIDTH, T_LENGTH, T_BPS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR, T_SAMPLE_FORMAT = 284, 317, 339
T_TILE_W, T_TILE_L, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_PIXEL_SCALE, T_TIEPOINT, T_GEOKEYS, T_GDAL_NODATA = 33550, 33922, 34735, 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _dtype_from(bps, fmt):
    key = (int(bps), int(fmt))
    table = {
        (8, 1): np.uint8, (8, 2): np.int8, (16, 1): np.uint16, (16, 2): np.int16,
        (32, 1): np.uint32, (32, 2): np.int32, (32, 3): np.float32,
        (64, 3): np.float64, (64, 1): np.uint64, (64, 2): np.int64,
    }
    if key not in table:
        raise ValueError("unsupported TIFF sample type bps={} fmt={}".format(bps, fmt))
    return np.dtype(table[key])


def _sample_format_of(dtype):
    if dtype.kind == "u":
        return 1
    if dtype.kind == "i":
        return 2
    if dtype.kind == "f":
        return 3
    raise ValueError("unsupported dtype {}".format(dtype))



def windowed_read(count, height, width, dtype, read_clamped, window,
                  boundless=False, fill_value=0, indexes=None):
    """rasterio-parity windowed read semantics, shared by every raster codec
    (TIFF here, NEON HDF5 in data/hyperspectral.py): Window.round(), clamp
    to the image, boundless fill_value padding, 1-based `indexes` selection.
    `read_clamped(r0, c0, r1, c1)` returns the in-image part [bands, h, w].
    """
    if window is None:
        window = Window(0, 0, width, height)
    else:
        window = window.round()
    def select(out):
        if indexes is not None:
            sel = [i - 1 for i in indexes] if not np.isscalar(indexes) else indexes - 1
            out = out[sel]
        return out

    c0, r0, w, h = window.col_off, window.row_off, window.width, window.height
    if w <= 0 or h <= 0:
        return select(np.zeros((count, max(h, 0), max(w, 0)), dtype))

    # clamp to image, remember padding
    rc0, cc0 = max(r0, 0), max(c0, 0)
    rc1, cc1 = min(r0 + h, height), min(c0 + w, width)
    if rc1 <= rc0 or cc1 <= cc0:
        if boundless:
            return select(np.full((count, h, w), fill_value, dtype))
        return select(np.zeros((count, 0, 0), dtype))

    inner = read_clamped(rc0, cc0, rc1, cc1)  # [bands, ih, iw]
    if not boundless:
        out = inner
    else:
        out = np.full((count, h, w), fill_value, dtype)
        out[:, rc0 - r0 : rc1 - r0, cc0 - c0 : cc1 - c0] = inner
    return np.ascontiguousarray(select(out))


class TiffReader:
    """Lazy windowed reader over one TIFF image (first IFD)."""

    def __init__(self, path):
        self.path = path
        self._fh = open(path, "rb")
        header = self._fh.read(8)
        if header[:2] == b"II":
            self._e = "<"
        elif header[:2] == b"MM":
            self._e = ">"
        else:
            raise ValueError("{} is not a TIFF".format(path))
        magic = struct.unpack(self._e + "H", header[2:4])[0]
        if magic != 42:
            raise ValueError("unsupported TIFF magic {} in {}".format(magic, path))
        ifd_off = struct.unpack(self._e + "I", header[4:8])[0]
        self.tags = self._read_ifd(ifd_off)
        self._parse()

    # -- metadata -----------------------------------------------------------
    def _read_ifd(self, off):
        e = self._e
        self._fh.seek(off)
        (n,) = struct.unpack(e + "H", self._fh.read(2))
        raw = self._fh.read(n * 12)
        tags = {}
        entries = []
        for i in range(n):
            tag, typ, count = struct.unpack(e + "HHI", raw[i * 12 : i * 12 + 8])
            val = raw[i * 12 + 8 : i * 12 + 12]
            entries.append((tag, typ, count, val))
        for tag, typ, count, val in entries:
            size = _TYPE_SIZES.get(typ, 1) * count
            if size <= 4:
                data = val[:size]
            else:
                (ptr,) = struct.unpack(e + "I", val)
                self._fh.seek(ptr)
                data = self._fh.read(size)
            tags[tag] = self._decode_values(typ, count, data)
        return tags

    def _decode_values(self, typ, count, data):
        e = self._e
        if typ == 2:  # ASCII
            return data.rstrip(b"\x00").decode("latin-1")
        if typ in (5, 10):  # RATIONAL / SRATIONAL
            vals = struct.unpack(e + ("I" if typ == 5 else "i") * (2 * count), data)
            # zero denominator is spec-undefined -> NaN; negative (SRATIONAL)
            # denominators divide normally
            return [
                (vals[2 * i] / vals[2 * i + 1]) if vals[2 * i + 1] else float("nan")
                for i in range(count)
            ]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            return data
        vals = struct.unpack(e + fmt * count, data)
        return list(vals)

    def _parse(self):
        t = self.tags
        self.width = int(t[T_WIDTH][0])
        self.height = int(t[T_LENGTH][0])
        self.count = int(t.get(T_SPP, [1])[0])  # bands
        bps = t.get(T_BPS, [8])[0]
        fmt = t.get(T_SAMPLE_FORMAT, [1])[0]
        self.dtype = _dtype_from(bps, fmt).newbyteorder(self._e)
        self.compression = int(t.get(T_COMPRESSION, [1])[0])
        self.planar = int(t.get(T_PLANAR, [1])[0])
        self.predictor = int(t.get(T_PREDICTOR, [1])[0])
        self.tiled = T_TILE_OFFSETS in t
        if self.tiled:
            self.tile_w = int(t[T_TILE_W][0])
            self.tile_l = int(t[T_TILE_L][0])
            self.offsets = t[T_TILE_OFFSETS]
            self.counts = t[T_TILE_COUNTS]
        else:
            self.rows_per_strip = int(t.get(T_ROWS_PER_STRIP, [self.height])[0])
            self.offsets = t[T_STRIP_OFFSETS]
            self.counts = t[T_STRIP_COUNTS]

        self.nodata = None
        if T_GDAL_NODATA in t:
            try:
                self.nodata = float(str(t[T_GDAL_NODATA]).strip())
            except ValueError:
                pass

        # georeferencing
        if T_PIXEL_SCALE in t and T_TIEPOINT in t:
            sx, sy = t[T_PIXEL_SCALE][0], t[T_PIXEL_SCALE][1]
            tp = t[T_TIEPOINT]
            px, py, gx, gy = tp[0], tp[1], tp[3], tp[4]
            west = gx - px * sx
            north = gy + py * sy
            self.transform = Affine(sx, 0, west, 0, -sy, north)
            self.res = (sx, sy)
        else:
            self.transform = Affine.identity()
            self.res = (1.0, 1.0)
        self.crs = None
        if T_GEOKEYS in t:
            keys = t[T_GEOKEYS]
            for i in range(4, len(keys), 4):
                if keys[i] == 3072:  # ProjectedCSTypeGeoKey
                    self.crs = int(keys[i + 3])
                elif keys[i] == 2048 and self.crs is None:  # GeographicTypeGeoKey
                    self.crs = int(keys[i + 3])

    @property
    def bounds(self):
        west = self.transform.c
        north = self.transform.f
        east = west + self.width * self.transform.a
        south = north + self.height * self.transform.e
        return (west, south, east, north)

    # -- decoding -----------------------------------------------------------
    def _decompress(self, data, out_size):
        if self.compression == 1:
            return data
        if self.compression in (8, 32946):  # deflate
            return zlib.decompress(data)
        if self.compression == 32773:  # packbits
            return _packbits_decode(data, out_size)
        if self.compression == 5:  # LZW
            return _lzw_decode(data, out_size)
        raise ValueError("unsupported TIFF compression {}".format(self.compression))

    def _segment(self, idx, seg_h, seg_w, bands_in_seg):
        """Decode segment idx -> array [seg_h, seg_w, bands_in_seg]."""
        self._fh.seek(self.offsets[idx])
        raw = self._fh.read(self.counts[idx])
        nbytes = seg_h * seg_w * bands_in_seg * self.dtype.itemsize
        raw = self._decompress(raw, nbytes)
        arr = np.frombuffer(raw[:nbytes], dtype=self.dtype).copy()
        arr = arr.reshape(seg_h, seg_w, bands_in_seg)
        if self.predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=self.dtype)
        elif self.predictor not in (1, 0):
            # e.g. 3 = floating-point predictor: decoding without reversing
            # it would silently return scrambled pixels
            raise ValueError(
                "unsupported TIFF predictor {}".format(self.predictor)
            )
        return arr

    def read(self, window=None, boundless=False, fill_value=0, indexes=None):
        """Read [bands, h, w]; `window` is an affine.Window (pixel units).

        boundless=True pads out-of-image regions with fill_value (rasterio
        semantics used by the per-pixel window cropper, reference
        src/patches.py:70).
        """
        return windowed_read(
            self.count, self.height, self.width, self.dtype,
            self._read_clamped, window,
            boundless=boundless, fill_value=fill_value, indexes=indexes,
        )

    def _read_clamped(self, r0, c0, r1, c1):
        h, w = r1 - r0, c1 - c0
        out = np.empty((self.count, h, w), self.dtype)
        if self.tiled:
            tiles_across = (self.width + self.tile_w - 1) // self.tile_w
            tiles_down = (self.height + self.tile_l - 1) // self.tile_l
            tiles_per_plane = tiles_across * tiles_down
            planes = self.count if self.planar == 2 else 1
            bands_in_seg = 1 if self.planar == 2 else self.count
            for plane in range(planes):
                for tr in range(r0 // self.tile_l, (r1 - 1) // self.tile_l + 1):
                    for tc in range(c0 // self.tile_w, (c1 - 1) // self.tile_w + 1):
                        idx = plane * tiles_per_plane + tr * tiles_across + tc
                        seg = self._segment(idx, self.tile_l, self.tile_w, bands_in_seg)
                        tr0, tc0 = tr * self.tile_l, tc * self.tile_w
                        sr0, sc0 = max(r0 - tr0, 0), max(c0 - tc0, 0)
                        sr1 = min(r1 - tr0, self.tile_l)
                        sc1 = min(c1 - tc0, self.tile_w)
                        piece = seg[sr0:sr1, sc0:sc1]
                        dst_r, dst_c = tr0 + sr0 - r0, tc0 + sc0 - c0
                        view = np.moveaxis(piece, -1, 0)
                        if self.planar == 2:
                            out[plane, dst_r : dst_r + piece.shape[0], dst_c : dst_c + piece.shape[1]] = view[0]
                        else:
                            out[:, dst_r : dst_r + piece.shape[0], dst_c : dst_c + piece.shape[1]] = view
        else:
            strips_per_plane = (self.height + self.rows_per_strip - 1) // self.rows_per_strip
            planes = self.count if self.planar == 2 else 1
            bands_in_seg = 1 if self.planar == 2 else self.count
            for plane in range(planes):
                for s in range(r0 // self.rows_per_strip, (r1 - 1) // self.rows_per_strip + 1):
                    sr_top = s * self.rows_per_strip
                    seg_h = min(self.rows_per_strip, self.height - sr_top)
                    idx = plane * strips_per_plane + s
                    seg = self._segment(idx, seg_h, self.width, bands_in_seg)
                    sr0 = max(r0 - sr_top, 0)
                    sr1 = min(r1 - sr_top, seg_h)
                    piece = seg[sr0:sr1, c0:c1]
                    dst_r = sr_top + sr0 - r0
                    view = np.moveaxis(piece, -1, 0)
                    if self.planar == 2:
                        out[plane, dst_r : dst_r + piece.shape[0], :] = view[0]
                    else:
                        out[:, dst_r : dst_r + piece.shape[0], :] = view
        return out

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def write_tiff(path, array, transform=None, crs=None, compress=None,
               tiled=None, tile_size=256, nodata=None):
    """Write [bands, h, w] (or [h, w]) to a GeoTIFF.

    compress: None | 'deflate'. tiled default: True for images > 512px.
    crs: EPSG code as int, "EPSG:NNNN" string, or CRS object (to_epsg()).
    """
    from deeptreeattention_tpu.geo import crs as crs_mod  # avoid import cycle

    crs = crs_mod.normalize_epsg(crs)
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[None]
    bands, height, width = arr.shape
    dtype = arr.dtype.newbyteorder("<")
    arr = arr.astype(dtype, copy=False)
    if tiled is None:
        tiled = max(height, width) > 512

    segments = []
    if tiled:
        tile_w = tile_l = tile_size
        tiles_across = (width + tile_w - 1) // tile_w
        tiles_down = (height + tile_l - 1) // tile_l
        # chunky interleave: [h, w, bands] per tile
        hw = np.moveaxis(arr, 0, -1)
        for tr in range(tiles_down):
            for tc in range(tiles_across):
                tile = np.zeros((tile_l, tile_w, bands), dtype)
                piece = hw[tr * tile_l : (tr + 1) * tile_l, tc * tile_w : (tc + 1) * tile_w]
                tile[: piece.shape[0], : piece.shape[1]] = piece
                segments.append(tile.tobytes())
    else:
        hw = np.moveaxis(arr, 0, -1)
        segments.append(np.ascontiguousarray(hw).tobytes())

    if compress == "deflate":
        comp_id = 8
        compressed = None
        if not os.environ.get("DTA_PY_TIFF"):
            try:  # parallel C++ deflate (threads pay off on multi-core hosts)
                from deeptreeattention_tpu.geo import native

                compressed = native.deflate_segments(segments, level=6)
            except Exception:
                compressed = None
        segments = compressed if compressed is not None else [
            zlib.compress(s, 6) for s in segments
        ]
    else:
        comp_id = 1

    sample_fmt = _sample_format_of(arr.dtype)
    bps = arr.dtype.itemsize * 8

    tags = []  # (tag, type, count, values)
    tags.append((T_WIDTH, 3, 1, [width]))
    tags.append((T_LENGTH, 3, 1, [height]))
    tags.append((T_BPS, 3, bands, [bps] * bands))
    tags.append((T_COMPRESSION, 3, 1, [comp_id]))
    tags.append((T_PHOTOMETRIC, 3, 1, [1]))
    tags.append((T_SPP, 3, 1, [bands]))
    if tiled:
        tags.append((T_TILE_W, 3, 1, [tile_w]))
        tags.append((T_TILE_L, 3, 1, [tile_l]))
        tags.append((T_TILE_OFFSETS, 4, len(segments), None))  # patched below
        tags.append((T_TILE_COUNTS, 4, len(segments), [len(s) for s in segments]))
    else:
        tags.append((T_ROWS_PER_STRIP, 3, 1, [height]))
        tags.append((T_STRIP_OFFSETS, 4, 1, None))
        tags.append((T_STRIP_COUNTS, 4, 1, [len(segments[0])]))
    tags.append((T_PLANAR, 3, 1, [1]))
    tags.append((T_SAMPLE_FORMAT, 3, bands, [sample_fmt] * bands))
    if transform is not None:
        tags.append((T_PIXEL_SCALE, 12, 3, [transform.a, -transform.e, 0.0]))
        tags.append((T_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, transform.c, transform.f, 0.0]))
    if crs:
        # geographic codes (4xxx) need GeographicTypeGeoKey (2048) with
        # model type 2; projected codes use ProjectedCSTypeGeoKey (3072)
        geographic = 4000 <= int(crs) < 5000
        model = 2 if geographic else 1
        crs_key = 2048 if geographic else 3072
        geokeys = [1, 1, 0, 3, 1024, 0, 1, model, 1025, 0, 1, 1,
                   crs_key, 0, 1, int(crs)]
        tags.append((T_GEOKEYS, 3, len(geokeys), geokeys))
    if nodata is not None:
        nd = "{}".format(nodata).encode() + b"\x00"
        tags.append((T_GDAL_NODATA, 2, len(nd), nd))

    tags.sort(key=lambda x: x[0])

    # layout: header(8) | IFD | out-of-line tag data | segment data
    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4

    # serialize out-of-line values
    out_of_line = []
    entries = []
    seg_offsets_pos = None
    cursor = data_off

    def _pack_values(typ, count, values):
        if typ == 2:
            return bytes(values)
        if typ == 12:
            return struct.pack("<" + "d" * count, *values)
        fmt = _TYPE_FMT[typ]
        return struct.pack("<" + fmt * count, *values)

    for tag, typ, count, values in tags:
        if values is None:  # segment offsets, patched after layout known
            if count * 4 <= 4:
                entries.append([tag, typ, count, None, "inline-offsets"])
            else:
                entries.append([tag, typ, count, cursor, "outline-offsets"])
                seg_offsets_pos = cursor
                cursor += count * 4
            continue
        blob = _pack_values(typ, count, values)
        if len(blob) <= 4:
            entries.append([tag, typ, count, blob.ljust(4, b"\x00"), "inline"])
        else:
            entries.append([tag, typ, count, cursor, "outline"])
            out_of_line.append((cursor, blob))
            cursor += len(blob)
            if cursor % 2:
                cursor += 1

    # segment data begins after tag data
    seg_start = cursor
    seg_offsets = []
    for s in segments:
        seg_offsets.append(seg_start)
        seg_start += len(s)
        if seg_start % 2:
            seg_start += 1

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(struct.pack("<H", n))
        for tag, typ, count, val, kind in entries:
            f.write(struct.pack("<HHI", tag, typ, count))
            if kind == "inline":
                f.write(val)
            elif kind == "inline-offsets":
                f.write(struct.pack("<I", seg_offsets[0]))
            else:  # outline pointer
                f.write(struct.pack("<I", val))
        f.write(struct.pack("<I", 0))  # next IFD
        for pos, blob in out_of_line:
            f.seek(pos)
            f.write(blob)
        if seg_offsets_pos is not None:
            f.seek(seg_offsets_pos)
            f.write(struct.pack("<" + "I" * len(seg_offsets), *seg_offsets))
        for off, s in zip(seg_offsets, segments):
            f.seek(off)
            f.write(s)
    return path


# ---------------------------------------------------------------------------
# compression helpers
# ---------------------------------------------------------------------------

def _packbits_decode(data, out_size):
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < out_size:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _lzw_decode(data, out_size):
    """TIFF-variant LZW (MSB-first codes, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table = None
    bits, acc, nbits = 0, 0, 9
    prev = None
    next_code = 258

    def reset():
        nonlocal table, nbits, next_code, prev
        table = {i: bytes([i]) for i in range(256)}
        nbits, next_code, prev = 9, 258, None

    reset()
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= nbits:
            code = (acc >> (bits - nbits)) & ((1 << nbits) - 1)
            bits -= nbits
            if code == CLEAR:
                reset()
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = table[prev] + entry[:1]
                next_code += 1
            else:
                entry = table[prev] + table[prev][:1]
                table[next_code] = entry
                next_code += 1
            out += entry
            prev = code
            if next_code == (1 << nbits) - 1 and nbits < 12:
                nbits += 1
            if len(out) >= out_size:
                return bytes(out)
    return bytes(out)
