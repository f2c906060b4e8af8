"""Pure-stdlib media codecs: PNG and WAV decode with no third-party libs.

These make the multimodal pipeline's decode step REAL for two container
formats (the rest stay behind the deterministic-fake import gate —
JPEG/GIF/FLV need codec libraries the sandbox doesn't ship):

- PNG: full header parse (IHDR) plus an actual pixel decode for
  non-interlaced 8-bit images — zlib-inflate the IDAT stream and invert
  the five scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9).
- WAV: RIFF chunk walk for the fmt/data chunks, PCM16/PCM8 sample decode.

Everything here is batch-callable from mapInPandas (bytes in, plain
Python out) — no Spark imports, so the kernels are unit-testable alone
and reusable from any executor-side UDF.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png_header(data: bytes) -> dict | None:
    """IHDR fields of a PNG byte string, or None if not a PNG."""
    if not data.startswith(PNG_MAGIC) or len(data) < 33:
        return None
    length, ctype = struct.unpack(">I4s", data[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    return {
        "width": w,
        "height": h,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": _PNG_CHANNELS.get(color_type, 0),
        "interlaced": interlace == 1,
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, raw 8-bit pixels row-major) of a
    non-interlaced 8-bit-depth PNG.  Raises ValueError on anything this
    decoder does not cover (interlace, 16-bit, palette) AND on corrupt
    input (bad deflate data, truncated chunks) — one exception type, so
    callers have a single fall-back decision."""
    hdr = parse_png_header(data)
    if hdr is None:
        raise ValueError("not a PNG")
    if hdr["interlaced"] or hdr["bit_depth"] != 8 or hdr["color_type"] == 3:
        raise ValueError("unsupported PNG variant (interlaced/16-bit/palette)")
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]

    # walk chunks, concatenate IDAT (truncated chunk -> ValueError)
    idat = bytearray()
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += data[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            break
        i += 12 + length  # len + type + payload + crc
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt deflate stream -> normalized error
        raise ValueError(f"PNG IDAT stream does not inflate: {e}") from e

    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has the wrong length")
    out = bytearray(h * stride)
    prev_row_start = -1
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        row_start = y * stride
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            if prev_row_start >= 0:
                for x in range(stride):
                    line[x] = (line[x] + out[prev_row_start + x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                up = out[prev_row_start + x] if prev_row_start >= 0 else 0
                line[x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                up = out[prev_row_start + x] if prev_row_start >= 0 else 0
                ul = out[prev_row_start + x - ch] if (prev_row_start >= 0 and x >= ch) else 0
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out[row_start : row_start + stride] = line
        prev_row_start = row_start
    return w, h, ch, out


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal PNG writer (filter 0 scanlines) — the fixture generator's
    encoder twin of :func:`decode_png`."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride]) for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def parse_wav_header(data: bytes) -> dict | None:
    """fmt-chunk fields + duration of a RIFF/WAVE byte string, or None."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, fmt, data_size = 12, None, None
    while i + 8 <= len(data):
        cid, csize = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= len(data):
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[i + 8 : i + 24]
            )
            fmt = {
                "audio_format": audio_fmt,
                "channels": channels,
                "sample_rate": rate,
                "bits_per_sample": bits,
            }
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    if data_size is not None and fmt["channels"] and fmt["bits_per_sample"]:
        bytes_per_frame = fmt["channels"] * fmt["bits_per_sample"] // 8
        fmt["n_frames"] = data_size // bytes_per_frame if bytes_per_frame else 0
        fmt["duration_s"] = (
            fmt["n_frames"] / fmt["sample_rate"] if fmt["sample_rate"] else 0.0
        )
    return fmt


def decode_wav(data: bytes) -> tuple[dict, list[float]]:
    """(header, samples in [-1, 1] interleaved) for PCM 8/16-bit WAV."""
    hdr = parse_wav_header(data)
    if hdr is None:
        raise ValueError("not a WAV")
    if hdr["audio_format"] != 1 or hdr["bits_per_sample"] not in (8, 16):
        raise ValueError("unsupported WAV encoding (non-PCM or odd bit depth)")
    i = 12
    payload = b""
    while i + 8 <= len(data):
        cid, csize = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"data":
            payload = data[i + 8 : i + 8 + csize]
            break
        i += 8 + csize + (csize & 1)
    if hdr["bits_per_sample"] == 16:
        n = len(payload) // 2
        ints = struct.unpack(f"<{n}h", payload[: n * 2])  # n*2 slice: never short
        samples = [v / 32768.0 for v in ints]
    else:  # PCM8 is unsigned
        samples = [(b - 128) / 128.0 for b in payload]
    return hdr, samples


def encode_wav(
    samples: list[float], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Minimal PCM16 WAV writer — the fixture generator's encoder twin."""
    ints = [max(-32768, min(32767, round(s * 32767))) for s in samples]
    payload = struct.pack(f"<{len(ints)}h", *ints)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(payload))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
