"""From-scratch baseline JPEG (operators/jpegcodec.py): bounded-error
round-trip (JPEG is lossy — the property is error ≤ bound, not
bit-identity), structural strictness, and the Spark decode key's
tolerance contract. Pure numpy tests, no Spark session except the
operator-level checks in test_multimodal_streaming.py."""

import numpy as np
import pytest

from toy_vector_db_spark.operators import jpegcodec as J


def test_flat_image_reconstructs_exactly():
    for val in (0, 64, 128, 255):
        img = np.full((16, 16, 1), val, dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img))
        # one DC coefficient per block, quantization step 16 → error ≤ 1
        assert np.abs(dec.astype(int) - int(val)).max() <= 1


def test_smooth_gradient_tight_error():
    x = np.linspace(0, 255, 24)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)[:, :, None]
    dec = J.decode_jpeg(J.encode_jpeg(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_noise_bounded_and_deterministic():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (19, 16, 1), dtype=np.uint8)
    enc = J.encode_jpeg(img)
    assert enc == J.encode_jpeg(img)  # byte-deterministic
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape
    # quality-50 on pure noise: large but far from garbage (~255)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 128


def test_odd_dims_crop_back():
    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (9, 13), (8, 8), (17, 16), (3, 40)]:
        img = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(img))
        assert dec.shape == (h, w, 1)


def test_zigzag_is_the_standard_scan():
    assert J.ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert len(set(J.ZIGZAG)) == 64 and J.ZIGZAG[-1] == (7, 7)


def test_structural_corruption_is_loud():
    img = np.full((8, 8, 1), 77, dtype=np.uint8)
    enc = J.encode_jpeg(img)
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x00" + enc[2:])  # bad SOI
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[:-2])  # missing EOI
    with pytest.raises(ValueError):
        # SOS before any tables: strip DQT/SOF/DHT
        sos = enc.index(b"\xff\xda")
        J.decode_jpeg(enc[:2] + enc[sos:])
    # NOTE: JPEG carries no checksum — flipping a bit inside the quant
    # table or entropy data can still decode (to wrong pixels). That is
    # inherent to the format, which is why the Spark key pairs the decode
    # with a tolerance check against the source pixels.


def test_decoder_uses_tables_from_the_file():
    """The decoder must rebuild Huffman tables from the DHT segment it
    read — swapping the table spec in the payload changes decoding (or
    fails), proving the module constants aren't silently trusted."""
    img = np.full((8, 8, 1), 200, dtype=np.uint8)
    enc = bytearray(J.encode_jpeg(img))
    dht = enc.index(b"\xff\xc4")
    # corrupt the DC BITS spec (first count byte after class/id)
    enc[dht + 5] ^= 0x01
    try:
        out = J.decode_jpeg(bytes(enc))
        changed = (out != J.decode_jpeg(J.encode_jpeg(img))).any()
    except ValueError:
        changed = True
    assert changed


def test_color_flat_image_reconstructs_exactly():
    """A constant-color image has one DC per component and zero AC in
    every block — quantization and 4:2:0 subsampling are lossless on
    it, so the round-trip must be exact on all three channels."""
    img = np.empty((24, 40, 3), dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 180, 90, 30
    dec = J.decode_jpeg_color(J.encode_jpeg_color(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_color_smooth_gradient_tight_error():
    """Smooth content is the codec's design point: per-channel linear
    gradients reconstruct within a small bound through the full YCbCr
    4:2:0 pipeline."""
    xx, yy = np.meshgrid(np.arange(32), np.arange(48))
    img = np.stack(
        [xx * 2 + yy, xx + yy * 2, 220 - (xx + yy)], axis=2
    ).astype(np.uint8)  # wrap-free ramps: max value 127/127/220
    dec = J.decode_jpeg_color(J.encode_jpeg_color(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_color_noise_bounded_and_deterministic():
    """ASCII-range noise (the corpus regime: adjacent text bytes land
    in different channels, so chroma is near-white-noise) stays inside
    JPEG_COLOR_TOL; encoding is byte-deterministic; odd dims crop back
    through the 16-multiple MCU padding."""
    from toy_vector_db_spark.operators.multimodal import JPEG_COLOR_TOL

    rng = np.random.default_rng(11)
    img = rng.integers(32, 127, size=(33, 31, 3), dtype=np.uint8)
    enc = J.encode_jpeg_color(img)
    assert enc == J.encode_jpeg_color(img)
    dec = J.decode_jpeg_color(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= JPEG_COLOR_TOL


def test_color_stream_structure_and_strictness():
    """The color stream carries BOTH quant tables, all FOUR Huffman
    specs, and the 4:2:0 SOF0 layout; structural corruption is loud on
    the color walker too."""
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    enc = J.encode_jpeg_color(img)
    dqt = enc.index(b"\xff\xdb")
    ln = int.from_bytes(enc[dqt + 2:dqt + 4], "big")
    assert ln == 2 + 2 * 65  # two 65-byte table specs in one DQT
    sof = enc.index(b"\xff\xc0")
    assert enc[sof + 9] == 3  # three components
    assert enc[sof + 11] == 0x22 and enc[sof + 14] == 0x11  # 4:2:0
    with pytest.raises(ValueError):
        J.decode_jpeg_color(b"\x00\x00" + enc[2:])  # bad SOI
    with pytest.raises(ValueError):
        J.decode_jpeg_color(enc[:-2])  # missing EOI
    with pytest.raises(ValueError):
        sos = enc.index(b"\xff\xda")
        J.decode_jpeg_color(enc[:2] + enc[sos:])  # SOS before tables
    # the gray decoder refuses the color stream (3-component SOF0)
    with pytest.raises(ValueError):
        J.decode_jpeg(enc)
    # and the color decoder refuses a gray stream (1-component SOF0)
    with pytest.raises(ValueError):
        J.decode_jpeg_color(J.encode_jpeg(np.full((8, 8, 1), 9, np.uint8)))


def test_color_chroma_tables_are_load_bearing():
    """Cb/Cr must be decoded under the CHROMINANCE tables the stream
    declares: corrupting the chroma DC BITS spec changes (or fails) the
    decode, proving the color path doesn't silently reuse the luma
    tables from the module constants."""
    img = np.empty((16, 16, 3), dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 200, 40, 120
    enc = bytearray(J.encode_jpeg_color(img))
    dht = enc.index(b"\xff\xc4")
    # the chroma DC spec sits after the two luma specs:
    # 1 + 16 + 12 (DC luma) + 1 + 16 + 162 (AC luma) bytes into the seg
    chroma_dc = dht + 4 + (1 + 16 + 12) + (1 + 16 + 162)
    assert enc[chroma_dc] == 0x01  # class 0, table id 1
    enc[chroma_dc + 1 + 1] ^= 0x01  # corrupt a BITS count
    try:
        out = J.decode_jpeg_color(bytes(enc))
        changed = (out != J.decode_jpeg_color(J.encode_jpeg_color(img))).any()
    except ValueError:
        changed = True
    assert changed
