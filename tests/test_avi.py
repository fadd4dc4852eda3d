"""MJPEG-in-AVI container (operators/avicodec.py): structural
round-trip, JPEG-bounded frame fidelity, strict failure on corrupt
magic/sizes/header-vs-content mismatches."""

import numpy as np
import pytest

from toy_vector_db_spark.operators import avicodec as A


def _frames(n, h=8, w=16, seed=9):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 1), dtype=np.uint8) for _ in range(n)]


def test_roundtrip_and_determinism():
    frames = _frames(5)
    avi = A.encode_avi(frames)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert avi == A.encode_avi(frames)
    dec = A.decode_avi(avi)
    assert len(dec) == 5
    for d, s in zip(dec, frames):
        assert d.shape == s.shape
        assert np.abs(d.astype(int) - s.astype(int)).max() <= 128


def test_single_frame_and_odd_geometry():
    for h, w in [(8, 16), (3, 5), (16, 16)]:
        dec = A.decode_avi(A.encode_avi(_frames(1, h, w)))
        assert len(dec) == 1 and dec[0].shape == (h, w, 1)


def test_corruption_is_loud():
    avi = A.encode_avi(_frames(3))
    b = bytearray(avi); b[0] ^= 1
    with pytest.raises(ValueError, match="magic"):
        A.decode_avi(bytes(b))
    b = bytearray(avi); b[4] ^= 1
    with pytest.raises(ValueError, match="RIFF size"):
        A.decode_avi(bytes(b))
    with pytest.raises(ValueError):
        A.decode_avi(avi[:-10])  # truncated movi


def test_header_frame_count_is_checked():
    """The decoder cross-checks avih TotalFrames against the frames it
    actually decoded — a mismatched header must not pass silently."""
    avi = bytearray(A.encode_avi(_frames(2)))
    hdrl = avi.index(b"avih")
    # TotalFrames sits 16 bytes into the avih payload (after the size word)
    off = hdrl + 8 + 16
    avi[off:off + 4] = (7).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frames"):
        A.decode_avi(bytes(avi))


def test_unknown_chunks_and_short_avih_are_typed_errors():
    """Advice r8 item 3: 'strict chunk walking' means TYPED rejection —
    unknown top-level chunks, unknown LIST types, and a truncated avih
    payload must all raise ValueError, not be skipped or crash with an
    untyped IndexError from short slices."""
    avi = A.encode_avi(_frames(2))
    # splice an unknown top-level chunk in front of the hdrl LIST
    junk = b"JUNK" + (4).to_bytes(4, "little") + b"\x00" * 4
    spliced = avi[:12] + junk + avi[12:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    with pytest.raises(ValueError, match="top-level"):
        A.decode_avi(spliced)
    # corrupt a LIST's type fourcc
    b = bytearray(avi)
    pos = b.index(b"hdrl")
    b[pos:pos + 4] = b"xxxx"
    with pytest.raises(ValueError, match="LIST type"):
        A.decode_avi(bytes(b))
    # shrink the declared avih length below the 40-byte fixed struct
    b = bytearray(avi)
    pos = b.index(b"avih") + 4
    b[pos:pos + 4] = (12).to_bytes(4, "little")
    with pytest.raises(ValueError, match="avih"):
        A.decode_avi(bytes(b))


def test_encoder_input_contract():
    with pytest.raises(ValueError):
        A.encode_avi([])
    with pytest.raises(ValueError, match="mixed"):
        A.encode_avi(_frames(1, 8, 16) + _frames(1, 8, 8))


def test_color_roundtrip_strictness_and_bitcount():
    """Round 14: channels=3 wraps per-frame YCbCr 4:2:0 color JPEGs —
    deterministic bytes, bounded error on ASCII-range frames, strf bit
    count 24, and channel-layout mismatches loud BOTH ways (gray decode
    of a color stream hits the 3-component SOF0 check; color decode of
    a gray stream the 1-component one)."""
    import numpy as np

    rng = np.random.default_rng(9)
    frames = [
        rng.integers(32, 127, size=(8, 16, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    avi = A.encode_avi(frames, channels=3)
    assert avi == A.encode_avi(frames, channels=3)
    dec = A.decode_avi(avi, channels=3)
    assert len(dec) == 4 and all(d.shape == (8, 16, 3) for d in dec)
    err = max(
        int(np.abs(d.astype(int) - s.astype(int)).max())
        for d, s in zip(dec, frames)
    )
    from toy_vector_db_spark.operators.multimodal import JPEG_COLOR_TOL

    assert err <= JPEG_COLOR_TOL
    strf = avi.index(b"MJPG", avi.index(b"strf"))  # fourcc inside strf
    # biPlanes|biBitCount little-endian: planes low word, bitcount high
    planes_bits = int.from_bytes(avi[strf - 4:strf], "little")
    assert planes_bits >> 16 == 24
    with pytest.raises(ValueError):
        A.decode_avi(avi)  # gray decode of color stream
    gray = A.encode_avi(
        [rng.integers(0, 256, size=(8, 16, 1), dtype=np.uint8)]
    )
    with pytest.raises(ValueError):
        A.decode_avi(gray, channels=3)  # color decode of gray stream
    with pytest.raises(ValueError, match="channel"):
        A.encode_avi(frames)  # gray encoder given RGB frames
