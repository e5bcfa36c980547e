"""Minimal pure-Python RIFF/WAVE container codec (public spec: the 1991
Microsoft/IBM Multimedia Programming Interface and Data Specification;
also summarized by RFC 2361): enough to give the AV family REAL container
bytes the way minipng/minijpeg did for images (VERDICT r8 #5).

Scope: canonical PCM WAVE — `RIFF` header + `fmt ` chunk (PCM, 16-bit) +
arbitrary extra chunks + `data` chunk. The writer emits spec-exact bytes;
the parser is a proper chunk WALKER (skips unknown chunks by their
declared size, honors RIFF's even-byte padding rule) rather than a
fixed-offset peek, and treats a data chunk whose declared size overruns
the file as error-as-data (`truncated`) instead of failing the scan —
the corpus-scan discipline (reference: image-analyzer.md:224-240).

Sample DECODE stays out of scope on purpose: duration/channels/rate are
header facts; `multimodal.av.decode_audio` remains the gated drop-in for
sample access (soundfile absent in this container).
"""

from __future__ import annotations

import struct

MAGIC = b"RIFF"
WAVE = b"WAVE"


def encode_wav(
    samples: bytes,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    extra_chunks: tuple[tuple[bytes, bytes], ...] = (),
) -> bytes:
    """Raw little-endian PCM sample bytes → canonical WAVE file bytes.

    `extra_chunks` (tag, body) pairs are written between `fmt ` and
    `data` — how real encoders emit LIST/INFO metadata; exercising the
    parser's chunk walk."""
    if bits % 8:
        raise ValueError("bits must be a multiple of 8")
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    chunks = [(b"fmt ", fmt), *extra_chunks, (b"data", samples)]
    body = bytearray(WAVE)
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF pads odd-sized chunks to even offsets
            body += b"\x00"
    return MAGIC + struct.pack("<I", len(body)) + bytes(body)


def parse_wav_header(raw: bytes) -> dict | None:
    """WAVE file bytes → header metadata, sample decode never runs.

    Returns {channels, sample_rate, bits, byte_rate, data_bytes, dur_ms,
    truncated} or None when the bytes are not a RIFF/WAVE container (the
    magic-sniff path — a scan over a mixed media lake must classify, not
    crash). `truncated` marks a data chunk whose declared size exceeds
    the bytes actually present (dur_ms still reflects the DECLARED size:
    that is what the header promises, and the flag carries the defect).
    """
    if len(raw) < 12 or raw[:4] != MAGIC or raw[8:12] != WAVE:
        return None
    fmt: dict | None = None
    data_declared: int | None = None
    data_actual: int | None = None
    pos = 12
    n = len(raw)
    while pos + 8 <= n:
        tag = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body_start = pos + 8
        if tag == b"fmt " and size >= 16:
            a_fmt, ch, rate, brate, _align, bits = struct.unpack(
                "<HHIIHH", raw[body_start : body_start + 16]
            )
            if a_fmt != 1:  # non-PCM: out of scope, not a crash
                return None
            fmt = {
                "channels": ch,
                "sample_rate": rate,
                "bits": bits,
                "byte_rate": brate,
            }
        elif tag == b"data":
            data_declared = size
            data_actual = min(size, n - body_start)
            break  # canonical layout: data is the payload tail
        pos = body_start + size + (size % 2)  # skip + even padding
    if fmt is None or data_declared is None or not fmt["byte_rate"]:
        return None
    return {
        **fmt,
        "data_bytes": data_declared,
        "dur_ms": data_declared * 1000 // fmt["byte_rate"],
        "truncated": data_actual < data_declared,
    }


def pcm_ramp(n_samples: int, seed: int, channels: int = 1) -> bytes:
    """Deterministic 16-bit PCM test signal: a seeded integer ramp — real
    sample bytes without float synthesis, reproducible from (n, seed)."""
    frames = bytearray()
    for i in range(n_samples * channels):
        v = ((seed * 31 + i * 7) % 65536) - 32768
        frames += struct.pack("<h", v)
    return bytes(frames)
