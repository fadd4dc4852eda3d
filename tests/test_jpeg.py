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
