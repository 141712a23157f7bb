"""Native rosbag reader round-trip: write a rosbag 2.0 file with a
minimal pure-Python writer (independent implementation of the public
format), read it back through the C++ reader, compare payloads.

Covers: uncompressed + bz2 chunks, PointCloud2 with/without ring+time
fields, Imu streams, topic listing, and malformed-file rejection.
"""

import bz2
import struct

import numpy as np
import pytest

from loam_tpu.io import rosbag as rb


# ---------------------------------------------------------------------------
# minimal bag 2.0 writer (test oracle)
# ---------------------------------------------------------------------------

def _field(name: bytes, value: bytes) -> bytes:
    body = name + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(header_fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in header_fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _header_dict(fields: dict) -> bytes:
    return b"".join(_field(k, v) for k, v in fields.items())


def _std_header(stamp: float, frame: bytes = b"velodyne") -> bytes:
    sec = int(stamp)
    nsec = int(round((stamp - sec) * 1e9))
    return (struct.pack("<I", 0) + struct.pack("<II", sec, nsec)
            + struct.pack("<I", len(frame)) + frame)


def _pointcloud2(stamp, xyz, ring=None, rel=None) -> bytes:
    n = xyz.shape[0]
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1)]
    step = 12
    if ring is not None:
        fields.append((b"ring", step, 4, 1))  # UINT16
        step += 2
    if rel is not None:
        fields.append((b"time", step, 7, 1))  # FLOAT32
        step += 4
    buf = bytearray(n * step)
    for i in range(n):
        o = i * step
        struct.pack_into("<fff", buf, o, *xyz[i])
        o += 12
        if ring is not None:
            struct.pack_into("<H", buf, o, int(ring[i]))
            o += 2
        if rel is not None:
            struct.pack_into("<f", buf, o, float(rel[i]))
    msg = _std_header(stamp)
    msg += struct.pack("<II", 1, n)          # height, width
    msg += struct.pack("<I", len(fields))
    for name, off, dtype, cnt in fields:
        msg += struct.pack("<I", len(name)) + name
        msg += struct.pack("<IBI", off, dtype, cnt)
    msg += struct.pack("<B", 0)              # is_bigendian
    msg += struct.pack("<II", step, step * n)
    msg += struct.pack("<I", len(buf)) + bytes(buf)
    msg += struct.pack("<B", 1)              # is_dense
    return msg


def _imu(stamp, quat, ang_vel, lin_acc) -> bytes:
    msg = _std_header(stamp, b"imu")
    msg += struct.pack("<4d", *quat)
    msg += struct.pack("<9d", *([0.0] * 9))
    msg += struct.pack("<3d", *ang_vel)
    msg += struct.pack("<9d", *([0.0] * 9))
    msg += struct.pack("<3d", *lin_acc)
    msg += struct.pack("<9d", *([0.0] * 9))
    return msg


def _connection(conn_id, topic: bytes, typ: bytes) -> bytes:
    data = _header_dict({
        b"topic": topic, b"type": typ,
        b"md5sum": b"0" * 32, b"message_definition": b"",
    })
    return _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", conn_id),
         b"topic": topic},
        data,
    )


def _message(conn_id, stamp, payload: bytes) -> bytes:
    sec = int(stamp)
    nsec = int(round((stamp - sec) * 1e9))
    return _record(
        {b"op": b"\x02", b"conn": struct.pack("<I", conn_id),
         b"time": struct.pack("<II", sec, nsec)},
        payload,
    )


def write_bag(path, messages, compression=b"none"):
    """messages: list of (conn_records, msg_records) flattened bytes that
    go inside one chunk."""
    chunk_body = b"".join(messages)
    if compression == b"bz2":
        comp = bz2.compress(chunk_body)
    else:
        comp = chunk_body
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record(
            {b"op": b"\x03",
             b"index_pos": struct.pack("<Q", 0),
             b"conn_count": struct.pack("<I", 2),
             b"chunk_count": struct.pack("<I", 1)},
            b" " * 4096,
        ))
        f.write(_record(
            {b"op": b"\x05", b"compression": compression,
             b"size": struct.pack("<I", len(chunk_body))},
            comp,
        ))


@pytest.fixture(scope="module")
def sample_data():
    rng = np.random.default_rng(0)
    clouds = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(3)]
    rings = [rng.integers(0, 16, 50).astype(np.uint16) for _ in range(3)]
    rels = [rng.uniform(0, 0.1, 50).astype(np.float32) for _ in range(3)]
    imu_t = np.arange(10) * 0.01 + 100.0
    quat = np.tile([0.0, 0.0, 0.0, 1.0], (10, 1))
    acc = rng.normal(size=(10, 3))
    return clouds, rings, rels, imu_t, quat, acc


def _build(path, sample_data, compression=b"none", with_ring=True):
    clouds, rings, rels, imu_t, quat, acc = sample_data
    recs = [
        _connection(0, b"/velodyne_points", b"sensor_msgs/PointCloud2"),
        _connection(1, b"/imu/data", b"sensor_msgs/Imu"),
    ]
    for k, xyz in enumerate(clouds):
        stamp = 100.0 + 0.1 * k
        recs.append(_message(0, stamp, _pointcloud2(
            stamp, xyz,
            rings[k] if with_ring else None,
            rels[k] if with_ring else None,
        )))
    for i in range(len(imu_t)):
        recs.append(_message(1, imu_t[i], _imu(
            imu_t[i], quat[i], [0.0, 0.0, 0.0], acc[i]
        )))
    write_bag(path, recs, compression)


@pytest.mark.parametrize("compression", [b"none", b"bz2"])
def test_roundtrip(tmp_path, sample_data, compression):
    clouds, rings, rels, imu_t, quat, acc = sample_data
    path = str(tmp_path / "test.bag")
    _build(path, sample_data, compression)

    with rb.BagReader(path) as bag:
        topics = bag.topics()
        assert topics["/velodyne_points"] == "sensor_msgs/PointCloud2"
        assert topics["/imu/data"] == "sensor_msgs/Imu"
        assert bag.count("/velodyne_points") == 3
        for k in range(3):
            xyz, ring, rel, stamp = bag.read_cloud("/velodyne_points", k)
            np.testing.assert_array_equal(xyz, clouds[k])
            np.testing.assert_array_equal(ring, rings[k].astype(np.int32))
            np.testing.assert_allclose(rel, rels[k])
            assert abs(stamp - (100.0 + 0.1 * k)) < 1e-6
        rec = bag.read_imu("/imu/data")
        np.testing.assert_allclose(rec.t, imu_t, atol=1e-9)
        np.testing.assert_allclose(rec.lin_acc, acc)
        np.testing.assert_allclose(rec.quat, quat)


def test_cloud_without_ring(tmp_path, sample_data):
    path = str(tmp_path / "noring.bag")
    _build(path, sample_data, with_ring=False)
    with rb.BagReader(path) as bag:
        xyz, ring, rel, _ = bag.read_cloud("/velodyne_points", 0)
        assert ring is None and rel is None
        assert xyz.shape == (50, 3)


def test_load_sweeps_and_imu(tmp_path, sample_data):
    clouds, *_ = sample_data
    path = str(tmp_path / "sweeps.bag")
    _build(path, sample_data)
    raw, mask, stamps = rb.load_sweeps(path, max_points=64)
    assert raw.shape == (3, 64, 3)
    assert mask[:, :50].all() and not mask[:, 50:].any()
    t, rpy, acc = rb.load_imu_stream(path)
    assert t.shape == (10,) and rpy.shape == (10, 3)
    np.testing.assert_allclose(rpy, 0.0, atol=1e-12)  # identity quats


def test_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.bag")
    with open(path, "wb") as f:
        f.write(b"not a bag at all")
    with pytest.raises(IOError):
        rb.BagReader(path)
