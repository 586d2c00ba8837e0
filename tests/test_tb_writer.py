"""TensorBoard event-file writer: framing and proto encoding round-trip."""

import glob
import os
import struct

import numpy as np

from tf_gnn_samples_tpu.utils import tb_writer as tbw


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        header = data[off:off + 8]
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == tbw._masked_crc(header)
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == tbw._masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    return records


def _decode_varint(buf, off):
    result = shift = 0
    while True:
        b = buf[off]
        result |= (b & 0x7F) << shift
        off += 1
        if not b & 0x80:
            return result, off
        shift += 7


def _decode_event(buf):
    """Tiny decoder for the Event subset we emit."""
    out = {"scalars": {}}
    off = 0
    while off < len(buf):
        key, off = _decode_varint(buf, off)
        field, wt = key >> 3, key & 7
        if wt == 1:
            (val,) = struct.unpack_from("<d", buf, off)
            off += 8
            if field == 1:
                out["wall_time"] = val
        elif wt == 0:
            val, off = _decode_varint(buf, off)
            if field == 2:
                out["step"] = val
        elif wt == 2:
            ln, off = _decode_varint(buf, off)
            chunk = buf[off:off + ln]
            off += ln
            if field == 3:
                out["file_version"] = chunk.decode()
            elif field == 5:  # summary
                soff = 0
                while soff < len(chunk):
                    skey, soff = _decode_varint(chunk, soff)
                    assert skey >> 3 == 1 and skey & 7 == 2
                    vlen, soff = _decode_varint(chunk, soff)
                    vbuf = chunk[soff:soff + vlen]
                    soff += vlen
                    tag, sv, voff = None, None, 0
                    while voff < len(vbuf):
                        vkey, voff = _decode_varint(vbuf, voff)
                        if vkey >> 3 == 1:
                            tlen, voff = _decode_varint(vbuf, voff)
                            tag = vbuf[voff:voff + tlen].decode()
                            voff += tlen
                        elif vkey >> 3 == 2:
                            (sv,) = struct.unpack_from("<f", vbuf, voff)
                            voff += 4
                    out["scalars"][tag] = sv
        else:
            raise AssertionError("unexpected wiretype %d" % wt)
    return out


def test_event_file_roundtrip(tmp_path):
    w = tbw.TensorBoardWriter(str(tmp_path))
    w.add_scalars(7, {"loss": 0.5, "accuracy": 0.875})
    w.add_scalars(14, {"loss": 0.25})
    records = _read_records(w.path)
    assert len(records) == 3
    head = _decode_event(records[0])
    assert head["file_version"] == "brain.Event:2"
    e1 = _decode_event(records[1])
    assert e1["step"] == 7
    np.testing.assert_allclose(e1["scalars"]["loss"], 0.5)
    np.testing.assert_allclose(e1["scalars"]["accuracy"], 0.875)
    e2 = _decode_event(records[2])
    assert e2["step"] == 14


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes -> 0x8A9136AA
    assert tbw._crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tbw._crc32c(b"\xff" * 32) == 0x62A8AB43


def test_folded_writer_creates_per_fold_dirs(tmp_path):
    fw = tbw.FoldedTensorBoardWriter(str(tmp_path), "run42")
    fw.write("train", 1, {"loss": 1.0})
    fw.write("valid", 1, {"loss": 2.0})
    fw.write("train", 2, {"loss": 0.5})
    train_files = glob.glob(os.path.join(tmp_path, "run42_train", "events.*"))
    valid_files = glob.glob(os.path.join(tmp_path, "run42_valid", "events.*"))
    assert len(train_files) == 1 and len(valid_files) == 1
    assert len(_read_records(train_files[0])) == 3  # header + 2 scalars
