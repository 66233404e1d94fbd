"""Pure-stdlib PNG codec (zlib + struct) for the multimodal decode tier.

The container ships no PIL/libvips, but PNG itself needs nothing beyond
``zlib`` (RFC 1950/1951) and chunk parsing (PNG spec, RFC 2083): IHDR for
dimensions, concatenated IDAT inflate, then per-scanline filter reversal
(None/Sub/Up/Average/Paeth). That is enough to give the multimodal operators
a REAL decoder for real pixels instead of a stub.

Scope: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+A),
6 (RGBA), non-interlaced — the overwhelming majority of real PNGs. Adam7
interlace and 16-bit depth raise ValueError (decode_image_real surfaces the
reason per row rather than crashing the batch).

Decode cost is O(pixels) Python-loop work per image; it runs worker-side
inside mapInPandas batches (bounded memory, parallel across partitions).
A vectorized numpy unfilter would cut constant factors; correctness first.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel by color type at bit depth 8
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Default decode budget: 64 MP ≈ a 192 MB RGB raster — far above any
#: legitimate thumbnail/feature workload, far below executor OOM territory.
MAX_PIXELS = 64_000_000


def decode_png(data: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, float]:
    """Decode a PNG → (width, height, mean_luma).

    mean_luma is the Rec.601 luma (0.299 R + 0.587 G + 0.114 B) averaged
    over all pixels, in [0, 255]; for grayscale it is the mean gray value.
    Alpha is ignored (luma of the stored color channels).

    Adversarial-input hardening (a corrupt blob must never kill the job, and
    a per-row try/except cannot catch an OOM): IHDR dimensions are checked
    against ``max_pixels`` BEFORE any allocation, and the IDAT inflate is
    bounded to the expected raster size via ``zlib.decompressobj`` with
    ``max_length`` — a zlib bomb raises ValueError instead of materializing.
    """
    if data[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if color_type == 3 and palette is None:
        raise ValueError("palette image missing PLTE")

    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    if width * height > max_pixels:
        raise ValueError(f"image {width}x{height} exceeds pixel budget {max_pixels}")

    bpp = _CHANNELS[color_type]
    stride = width * bpp
    expected = (stride + 1) * height
    # bounded inflate: never materialize more than the declared raster needs,
    # whatever the compressed stream claims (cap at expected+1 so a valid
    # stream is never truncated mid-flush, but a bomb stops one byte over)
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) > expected:
        raise ValueError(f"IDAT inflates past expected raster size {expected}")
    if len(raw) < expected:
        raise ValueError(f"truncated IDAT: {len(raw)} < {expected}")

    prev = bytearray(stride)
    luma_sum = 0.0
    for y in range(height):
        base = y * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad filter byte {filt} on row {y}")

        if color_type == 0:
            luma_sum += sum(line)
        elif color_type == 4:
            luma_sum += sum(line[0::2])
        elif color_type == 3:
            for i in line:
                r, g, b = palette[3 * i : 3 * i + 3]
                luma_sum += 0.299 * r + 0.587 * g + 0.114 * b
        else:  # 2 (RGB) or 6 (RGBA)
            for px in range(0, stride, bpp):
                luma_sum += (
                    0.299 * line[px] + 0.587 * line[px + 1] + 0.114 * line[px + 2]
                )
        prev = line
    return width, height, luma_sum / (width * height)


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Minimal PNG encoder (filter 0 rows, one zlib IDAT) — test fixture
    factory for :func:`decode_png`; also round-trips through PIL/browsers.
    ``pixels`` is row-major packed bytes for the given color type at depth 8.
    """
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} pixel bytes, got {len(pixels)}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
