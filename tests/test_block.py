"""TFRecord/Example parser tests for the Block-NeRF extractor."""
import io
import struct

import numpy as np

from ingp_tpu.data.block import iter_tfrecord, parse_example, \
    extract_block_images


def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _field(num, payload):
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _example(features: dict):
    feats = b""
    for key, (kind, values) in features.items():
        if kind == "bytes":
            flist = b"".join(_field(1, v) for v in values)
            feature = _field(1, flist)
        elif kind == "int":
            packed = b"".join(_varint(v) for v in values)
            flist = _field(1, packed)
            feature = _field(3, flist)
        elif kind == "float":
            packed = np.asarray(values, "<f4").tobytes()
            flist = _field(1, packed)
            feature = _field(2, flist)
        entry = _field(1, key.encode()) + _field(2, feature)
        feats += _field(1, entry)
    return _field(1, feats)  # Example.features


def _tfrecord_bytes(records):
    out = b""
    for rec in records:
        out += struct.pack("<Q", len(rec)) + b"\x00" * 4 + rec \
            + b"\x00" * 4
    return out


def test_parse_example_roundtrip(tmp_path):
    ex = _example({
        "image": ("bytes", [b"PNGDATA"]),
        "image_hash": ("int", [42]),
        "ray_origins": ("float", [1.0, 2.5, -3.0]),
    })
    path = tmp_path / "t.tfrecord"
    path.write_bytes(_tfrecord_bytes([ex]))
    recs = list(iter_tfrecord(str(path)))
    assert len(recs) == 1
    parsed = parse_example(recs[0])
    assert parsed["image"] == [b"PNGDATA"]
    assert parsed["image_hash"] == [42]
    np.testing.assert_allclose(parsed["ray_origins"], [1.0, 2.5, -3.0])


def test_extract_block_images(tmp_path):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((4, 4, 3), 128, np.uint8)).save(buf, "PNG")
    ex = _example({"image": ("bytes", [buf.getvalue()]),
                   "image_hash": ("int", [7])})
    path = tmp_path / "t.tfrecord"
    path.write_bytes(_tfrecord_bytes([ex]))
    out = tmp_path / "imgs"
    n = extract_block_images([str(path)], str(out))
    assert n == 1
    assert (out / "7.png").exists()
