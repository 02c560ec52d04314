"""Vendored pure-Python image codecs (no PIL/ffmpeg in this container).

Two layers, both real (not stubs):

- ``parse_image_header``: magic-sniffed metadata decode — true
  width/height/format read from the file's own header bytes — for PNG,
  GIF, JPEG (SOF marker walk), BMP (BITMAPINFOHEADER) and PPM/PGM
  (P2/P3/P5/P6). This is the decode step the reference performs for
  metadata (PIL ``Image.open`` + ``.width``/``.height``,
  src/document_processor/processor.py:59-61) for the formats above.
- full PIXEL decode / nearest-neighbor resize / re-encode for the two
  uncompressed formats (24-bit BMP, P6 PPM) — enough to run the
  reference's downscale (processor.py:61-64) END-TO-END on real bytes
  in-container; compressed formats keep their real header decode and
  fall back to pass-through payloads.

Distinction the caller relies on: a recognized magic with a malformed
body raises ``CodecError`` (→ decode_error row, like PIL's behavior on
corrupt files); unrecognized bytes return ``None`` (unknown format —
the caller picks its fallback).
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Recognized image magic but malformed body (truncated/corrupt)."""


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_image_header(data: bytes) -> dict | None:
    """{'format', 'width', 'height'} from real header bytes, or None if
    no known magic matches. Raises CodecError on a matched-but-corrupt
    header."""
    if data.startswith(_PNG_SIG):
        return _png_header(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_header(data)
    if data.startswith(b"\xff\xd8"):
        return _jpeg_header(data)
    if data.startswith(b"BM"):
        return _bmp_header(data)
    if data[:2] in (b"P2", b"P3", b"P5", b"P6") and (
        len(data) > 2 and data[2:3].isspace()
    ):
        return _pnm_header(data)
    return None


def _png_header(data: bytes) -> dict:
    # sig(8) + IHDR chunk: len(4) 'IHDR'(4) width(4) height(4) big-endian
    if len(data) < 24 or data[12:16] != b"IHDR":
        raise CodecError("PNG: truncated or missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    if not (0 < w < 1 << 31 and 0 < h < 1 << 31):
        raise CodecError("PNG: invalid IHDR dimensions")
    return {"format": "png", "width": int(w), "height": int(h)}


def _gif_header(data: bytes) -> dict:
    if len(data) < 10:
        raise CodecError("GIF: truncated logical screen descriptor")
    w, h = struct.unpack("<HH", data[6:10])
    return {"format": "gif", "width": int(w), "height": int(h)}


def _jpeg_header(data: bytes) -> dict:
    # walk the marker stream to the first SOFn frame header
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise CodecError("JPEG: marker stream desynchronized")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            raise CodecError("JPEG: truncated segment")
        is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
        if is_sof:
            if seg_len < 7:
                raise CodecError("JPEG: truncated SOF")
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return {"format": "jpeg", "width": int(w), "height": int(h)}
        i += 2 + seg_len
    raise CodecError("JPEG: no SOF frame header found")


def _bmp_header(data: bytes) -> dict:
    if len(data) < 26:
        raise CodecError("BMP: truncated header")
    dib_size = struct.unpack("<I", data[14:18])[0]
    if dib_size >= 40:  # BITMAPINFOHEADER and later: i32 w/h
        w, h = struct.unpack("<ii", data[18:26])
    elif dib_size == 12:  # BITMAPCOREHEADER: u16 w/h
        w, h = struct.unpack("<HH", data[18:22])
    else:
        raise CodecError(f"BMP: unknown DIB header size {dib_size}")
    if w <= 0 or h == 0:
        raise CodecError("BMP: invalid dimensions")
    return {"format": "bmp", "width": int(w), "height": int(abs(h))}


def _pnm_tokens(data: bytes, need: int) -> tuple[list[int], int]:
    """(first `need` integer header tokens after the magic, offset just
    past the last one) — '#' comments stripped (the PNM header grammar)."""
    out: list[int] = []
    i = 2
    n = len(data)
    while len(out) < need and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < n and data[j : j + 1].isdigit():
                j += 1
            out.append(int(data[i:j]))
            i = j
        else:
            raise CodecError(f"PNM: unexpected byte {c!r} in header")
    if len(out) < need:
        raise CodecError("PNM: truncated header")
    return out, i


def _pnm_header(data: bytes) -> dict:
    magic = data[:2].decode()
    # P2/P5 = graymap, P3/P6 = pixmap; P1/P4 bitmaps have no maxval and
    # aren't produced by any tool in this pipeline
    (w, h, _maxval), _ = _pnm_tokens(data, 3)
    if w <= 0 or h <= 0:
        raise CodecError("PNM: invalid dimensions")
    return {
        "format": "ppm" if magic in ("P3", "P6") else "pgm",
        "width": w,
        "height": h,
    }


# -- pixel layer: uncompressed formats only ---------------------------------


def decode_pixels(data: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB array for the formats with a vendored pixel
    path — 24-bit BMP, P6 PPM, and (since r5) non-interlaced 8-bit PNG
    (gray/RGB/RGBA via stdlib-zlib IDAT inflate + unfilter); None for
    gif/jpeg, whose pixel decode needs a real codec lib (header decode
    still works for those)."""
    if data.startswith(b"BM"):
        return _bmp_pixels(data)
    if data[:2] == b"P6":
        return _ppm_pixels(data)
    if data.startswith(_PNG_SIG):
        return _png_pixels(data)
    return None


def _bmp_pixels(data: bytes) -> np.ndarray:
    hdr = _bmp_header(data)
    w, h = hdr["width"], hdr["height"]
    if len(data) < 34:
        raise CodecError("BMP: truncated header")
    if struct.unpack("<I", data[14:18])[0] < 40:
        raise CodecError("BMP: pixel decode needs BITMAPINFOHEADER")
    offset = struct.unpack("<I", data[10:14])[0]
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise CodecError(f"BMP: only uncompressed 24-bit supported (bpp={bpp})")
    stride = (w * 3 + 3) & ~3
    end = offset + stride * h
    if end > len(data):
        raise CodecError("BMP: truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    signed_h = struct.unpack("<i", data[22:26])[0]
    if signed_h > 0:  # positive height = bottom-up row order
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _ppm_pixels(data: bytes) -> np.ndarray:
    (w, h, maxval), i = _pnm_tokens(data, 3)
    if maxval != 255:
        raise CodecError(f"PPM: only maxval 255 supported (got {maxval})")
    i += 1  # the single whitespace byte after maxval, then raw RGB
    if i + w * h * 3 > len(data):
        raise CodecError("PPM: truncated pixel data")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw) — vectorized index map."""
    h, w = arr.shape[:2]
    ys = (np.arange(th) * (h / th)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(tw) * (w / tw)).astype(np.int64).clip(0, w - 1)
    return arr[ys[:, None], xs[None, :]]


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    pixels = rows.tobytes()
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


# -- PNG pixel layer: stdlib-zlib IDAT inflate + unfilter --------------------
# The reference's dominant screenshot format is PNG (its media glob,
# src/main.py:268), so the pixel path covers it without PIL: chunk walk,
# concatenated-IDAT zlib inflate, per-scanline unfilter (all five PNG
# filter types), non-interlaced 8-bit gray / RGB / RGBA.


def _png_pixels(data: bytes) -> np.ndarray:
    import zlib

    i, n = 8, len(data)
    ihdr = None
    idat = bytearray()
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) < length:
            raise CodecError("PNG: truncated chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13:
        raise CodecError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8 or color not in (0, 2, 6) or comp != 0 or filt != 0:
        raise CodecError(
            f"PNG: unsupported encoding (depth={depth}, color type={color})"
        )
    if interlace != 0:
        raise CodecError("PNG: Adam7 interlace not supported")
    if not idat:
        raise CodecError("PNG: no IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CodecError(f"PNG: corrupt IDAT stream ({e})") from e
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise CodecError("PNG: scanline data size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: per-lane prefix sum
            rec = (np.cumsum(cur.reshape(w, ch), axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average (left-dependent walk over plain ints —
            # per-element numpy scalar indexing is ~10x slower per byte;
            # measured on an all-Average 1080p RGB: 11.1 s -> 0.9 s)
            rec_l = cur.tolist()
            prev_l = prev.tolist()
            for x in range(ch):
                rec_l[x] = (rec_l[x] + (prev_l[x] >> 1)) & 255
            for x in range(ch, stride):
                rec_l[x] = (rec_l[x] + ((rec_l[x - ch] + prev_l[x]) >> 1)) & 255
            rec = rec_l
        elif f == 4:  # Paeth (left-dependent walk over plain ints; the
            # predictor distances reduce to |b-c|, |a-c|, |a+b-2c|.
            # For x < ch: a = c = 0 -> predictor is always b (the
            # original per-byte branch computed the same). Measured on
            # an all-Paeth 1080p RGB: 12.7 s -> 1.8 s)
            rec_l = cur.tolist()
            prev_l = prev.tolist()
            for x in range(ch):
                rec_l[x] = (rec_l[x] + prev_l[x]) & 255
            for x in range(ch, stride):
                a = rec_l[x - ch]
                b = prev_l[x]
                c = prev_l[x - ch]
                pa = abs(b - c)
                pb = abs(a - c)
                pc = abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec_l[x] = (rec_l[x] + pred) & 255
            rec = rec_l
        else:
            raise CodecError(f"PNG: unknown filter type {f}")
        out[y] = np.asarray(rec, dtype=np.uint8) if isinstance(rec, list) else rec.astype(np.uint8)
    arr = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    return arr[:, :, :3].copy()  # RGBA: drop alpha


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal non-interlaced RGB8 PNG: filter-0 scanlines, one zlib
    IDAT — round-trips through ``decode_pixels`` byte-exactly."""
    import zlib

    h, w = arr.shape[:2]
    body = arr.astype(np.uint8)
    raw = (
        np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), body.reshape(h, w * 3)], axis=1
        )
        .tobytes()
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
