"""MJPEG-in-AVI video container, from scratch (RIFF per the public
Microsoft AVI spec). Each frame is a baseline JPEG (operators/jpegcodec)
inside a '00dc' chunk of the 'movi' list; the header carries the real
frame geometry and count. With this, all three multimodal payload types
ride a REAL standard container: PNG/JPEG images, WAV audio, AVI video —
no imaging/av library, only stdlib + numpy + public specs.

The writer emits the minimal standards-shaped file (RIFF/AVI , hdrl with
avih + one strl video stream, movi with one 00dc chunk per frame); the
reader walks chunks strictly — magic, list types, chunk sizes, header
geometry vs actual decoded frames are all verified loudly.
"""

from __future__ import annotations

import numpy as np

from toy_vector_db_spark.operators.jpegcodec import (
    decode_jpeg,
    decode_jpeg_color,
    encode_jpeg,
    encode_jpeg_color,
)

FPS = 10  # nominal playback rate carried in the header


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(frames: list[np.ndarray], channels: int = 1) -> bytes:
    """Encode uint8 frames as MJPEG-in-AVI — (h, w, 1) gray by default,
    (h, w, 3) RGB with ``channels=3`` (round 14: per-frame baseline
    YCbCr 4:2:0 color JPEGs, strf bit count 24). All frames must share
    one geometry (the container has a single video stream)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if not frames:
        raise ValueError("AVI encoder needs at least one frame")
    h, w, c = frames[0].shape
    if c != channels:
        raise ValueError(f"{channels}-channel frames only, got {frames[0].shape}")
    for f in frames:
        if f.shape != (h, w, channels):
            raise ValueError(
                f"mixed frame geometry: {f.shape} vs {(h, w, channels)}"
            )
    n = len(frames)
    us_per_frame = 1_000_000 // FPS
    # avih: MicroSecPerFrame, MaxBytesPerSec, Padding, Flags, TotalFrames,
    # InitialFrames, Streams, SuggestedBufferSize, Width, Height, reserved×4
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [us_per_frame, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0]
    )
    # strh: fccType 'vids', handler 'MJPG', flags, prio/lang, InitialFrames,
    # Scale, Rate, Start, Length, BufSize, Quality, SampleSize, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + b"".join(v.to_bytes(4, "little") for v in [0, 0, 0, 1, FPS, 0, n, 0, 0, 0])
        + (0).to_bytes(4, "little")  # rcFrame (two packed 16-bit pairs)
        + (w | (h << 16)).to_bytes(4, "little")
    )
    # strf = BITMAPINFOHEADER: biSize, W, H, planes|bitcount, 'MJPG',
    # SizeImage, XPels, YPels, ClrUsed, ClrImportant
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1 | (8 * channels << 16)).to_bytes(4, "little")
        + b"MJPG"
        + b"".join(v.to_bytes(4, "little") for v in [w * h, 0, 0, 0, 0])
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    enc = encode_jpeg if channels == 1 else encode_jpeg_color
    movi = _list(b"movi", b"".join(_chunk(b"00dc", enc(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi(payload: bytes, channels: int = 1) -> list[np.ndarray]:
    """Parse an MJPEG AVI back to its frames — per-frame JPEGs decoded
    gray by default, YCbCr 4:2:0 color with ``channels=3``. Strict:
    RIFF/AVI magic, declared sizes, header frame count and geometry
    must all match the frames actually decoded, and a stream whose
    JPEG component layout disagrees with ``channels`` fails loudly in
    the frame decoder (3-component SOF0 vs gray and vice versa)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    dec = decode_jpeg if channels == 1 else decode_jpeg_color
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError(f"bad AVI magic: {payload[:4]!r}/{payload[8:12]!r}")
    declared = int.from_bytes(payload[4:8], "little")
    if declared != len(payload) - 8:
        raise ValueError(f"RIFF size {declared} != payload {len(payload) - 8}")
    pos = 12
    n_hdr = width = height = None
    frames: list[np.ndarray] = []
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        data = payload[pos + 8:pos + 8 + size]
        if len(data) != size:
            raise ValueError(f"truncated chunk {fourcc!r}")
        if fourcc == b"LIST":
            ltype, body = data[:4], data[4:]
            if ltype == b"hdrl":
                if body[:4] != b"avih":
                    raise ValueError("hdrl must start with avih")
                avih_len = int.from_bytes(body[4:8], "little")
                # avih is a fixed 14×4-byte struct; a short payload would
                # otherwise slice garbage/raise untyped below (advice r8
                # item 3: strict means typed errors, not short-slice luck)
                if avih_len < 40 or len(body) < 8 + avih_len:
                    raise ValueError(f"avih payload too short: {avih_len}")
                avih = body[8:8 + avih_len]
                n_hdr = int.from_bytes(avih[16:20], "little")
                width = int.from_bytes(avih[32:36], "little")
                height = int.from_bytes(avih[36:40], "little")
            elif ltype == b"movi":
                mp = 0
                while mp + 8 <= len(body):
                    cc = body[mp:mp + 4]
                    sz = int.from_bytes(body[mp + 4:mp + 8], "little")
                    if cc == b"00dc":
                        frames.append(dec(body[mp + 8:mp + 8 + sz]))
                    else:
                        raise ValueError(f"unexpected movi chunk {cc!r}")
                    mp += 8 + sz + (sz % 2)
            else:
                raise ValueError(f"unexpected LIST type {ltype!r}")
        else:
            # the writer emits only LIST chunks at top level; anything
            # else is not a file this strict walker claims to understand
            raise ValueError(f"unexpected top-level chunk {fourcc!r}")
        pos += 8 + size + (size % 2)
    if n_hdr is None:
        raise ValueError("AVI missing hdrl")
    if len(frames) != n_hdr:
        raise ValueError(f"header claims {n_hdr} frames, movi has {len(frames)}")
    for f in frames:
        if f.shape != (height, width, channels):
            raise ValueError(
                f"frame geometry {f.shape} != header {(height, width, channels)}"
            )
    return frames
