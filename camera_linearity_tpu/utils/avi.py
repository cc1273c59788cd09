"""Minimal MJPG-in-AVI chunk reader (pure Python, streaming).

The video statistics pipeline's fast decode path (``decoder="turbo"`` in
models/video.py) needs each frame's raw JPEG payload to hand to the native
libjpeg decoder; OpenCV only exposes decoded frames.  An AVI file is a RIFF
tree — this walks it linearly and yields the video-stream data chunks,
which for an MJPG codec are complete JFIF images.

Handles the OpenDML/AVIX extension OpenCV's writer emits for files >1-2 GB
(the movi data simply continues inside subsequent ``RIFF AVIX`` segments —
the generic descend-into-RIFF/LIST rule covers it) and skips index
(``idx1``/``ix..``), ``JUNK``, and header chunks by the same rule.

Reference decode flow being accelerated: modules/general_functions.py:226-251
(cv2.VideoCapture frame generator).
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Iterator, Optional, Tuple

__all__ = ["mjpg_chunks", "probe_mjpg"]

# containers we descend into: their payload is a fourcc + nested chunks
_CONTAINERS = (b"RIFF", b"LIST")


def _stream_chunks(f, data_fourccs) -> Iterator[bytes]:
    """Linear RIFF walk yielding the payload of every chunk whose fourcc is
    in ``data_fourccs``.  Tolerates trailing garbage after the last
    well-formed chunk (truncated writers) by stopping cleanly."""
    read, seek = f.read, f.seek
    while True:
        header = read(8)
        if len(header) < 8:
            return
        fourcc, size = struct.unpack("<4sI", header)
        if fourcc in _CONTAINERS:
            seek(4, 1)  # skip the list/form type, descend into children
            continue
        if fourcc in data_fourccs:
            payload = read(size)
            if len(payload) < size:
                return  # truncated final chunk
            yield payload
        else:
            seek(size, 1)
        if size & 1:
            seek(1, 1)  # RIFF chunks are word-aligned


def mjpg_chunks(path: Path, stream: int = 0) -> Iterator[bytes]:
    """Yield each video frame's JPEG bytes from an MJPG AVI file.

    ``stream`` selects the AVI stream number (OpenCV writes video as
    stream 0).  Chunks with both the compressed (``dc``) and uncompressed
    (``db``) suffix are treated as frames — MJPG writers use ``dc``.
    """
    prefix = b"%02d" % stream
    fourccs = (prefix + b"dc", prefix + b"db")
    with open(path, "rb", buffering=1 << 20) as f:
        for payload in _stream_chunks(f, fourccs):
            yield payload


def probe_mjpg(path: Path) -> Optional[Tuple[int, int]]:
    """(height, width) if ``path`` is an AVI whose first video frame is a
    JPEG (SOI marker), else None — the gate for the turbo decode path.

    Geometry comes from the JPEG's own SOF segment, not the AVI header, so
    a lying container cannot route mismatched frames into a fixed-size
    decode buffer (the native decoder re-checks per frame anyway).
    """
    try:
        with open(path, "rb") as f:
            if f.read(4) != b"RIFF":
                return None
            f.seek(8)
            if f.read(4) != b"AVI ":
                return None
            f.seek(12)
            first = next(_stream_chunks(f, (b"00dc", b"00db")), None)
    except OSError:
        return None
    if first is None or first[:2] != b"\xff\xd8":
        return None
    return _jpeg_geometry(first)


def _jpeg_geometry(data: bytes) -> Optional[Tuple[int, int]]:
    """(height, width) from a JPEG's start-of-frame segment."""
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:  # 0xFF fill bytes before a marker are legal
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry geometry
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            height, width = struct.unpack(">HH", data[i + 5:i + 9])
            return height, width
        i += 2 + seg_len
    return None
