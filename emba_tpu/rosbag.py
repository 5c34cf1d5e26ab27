"""Minimal pure-python ROS1 bag (V2.0) reader for DVS event data.

Replaces the reference's ROS ``rosbag``/``dvs_msgs`` dependency
(``src/utils/rosbag_loading.cpp:11-116``): extracts ``dvs_msgs/EventArray``
events (and optionally ``sensor_msgs/CameraInfo``) from a bag within a time
interval, sorted by timestamp.

Supports uncompressed and bz2-compressed chunks (lz4 if the ``lz4`` module
is importable). No external dependencies.
"""

from __future__ import annotations

import bz2
import struct
from dataclasses import dataclass

import numpy as np

_OP_MSG = 0x02
_OP_BAG_HEADER = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNK_INFO = 0x06
_OP_CONNECTION = 0x07


def _read_header(buf: bytes) -> dict:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        field = buf[off : off + flen]
        off += flen
        k, _, v = field.partition(b"=")
        fields[k.decode()] = v
    return fields


def _iter_records(data: bytes):
    off = 0
    n = len(data)
    while off + 8 <= n:
        (hlen,) = struct.unpack_from("<I", data, off)
        off += 4
        header = _read_header(data[off : off + hlen])
        off += hlen
        (dlen,) = struct.unpack_from("<I", data, off)
        off += 4
        payload = data[off : off + dlen]
        off += dlen
        yield header, payload


@dataclass
class CameraInfo:
    width: int
    height: int
    distortion_model: str
    D: np.ndarray
    K: np.ndarray
    R: np.ndarray
    P: np.ndarray


def _parse_camera_info(data: bytes) -> CameraInfo:
    off = 0
    # std_msgs/Header: seq, stamp(2x uint32), frame_id string
    off += 4 + 8
    (slen,) = struct.unpack_from("<I", data, off)
    off += 4 + slen
    height, width = struct.unpack_from("<II", data, off)
    off += 8
    (slen,) = struct.unpack_from("<I", data, off)
    off += 4
    model = data[off : off + slen].decode()
    off += slen
    (dn,) = struct.unpack_from("<I", data, off)
    off += 4
    D = np.frombuffer(data, "<f8", dn, off).copy()
    off += 8 * dn
    K = np.frombuffer(data, "<f8", 9, off).copy()
    off += 72
    R = np.frombuffer(data, "<f8", 9, off).copy()
    off += 72
    P = np.frombuffer(data, "<f8", 12, off).copy()
    return CameraInfo(width, height, model, D, K, R, P)


def _parse_event_array(data: bytes):
    """dvs_msgs/EventArray -> (t (N,) f64 seconds, x, y, pol) arrays."""
    off = 0
    off += 4 + 8  # header seq + stamp
    (slen,) = struct.unpack_from("<I", data, off)
    off += 4 + slen
    off += 8  # height, width
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    # each event: x uint16, y uint16, ts (sec uint32, nsec uint32), pol uint8
    rec = np.frombuffer(data, dtype=np.dtype(
        [("x", "<u2"), ("y", "<u2"), ("sec", "<u4"), ("nsec", "<u4"), ("pol", "u1")]
    ), count=n, offset=off)
    t = rec["sec"].astype(np.float64) + rec["nsec"].astype(np.float64) * 1e-9
    return t, rec["x"].astype(np.int32), rec["y"].astype(np.int32), rec[
        "pol"
    ].astype(np.int8)


def parse_rosbag(
    path: str,
    events_topic: str,
    camera_info_topic: str | None = None,
    tmin: float = -np.inf,
    tmax: float = np.inf,
):
    """Read events (and optionally the first CameraInfo) from a ROS1 bag.

    Returns ((t, x, y, pol) sorted by t within [tmin, tmax], CameraInfo|None).
    Mirrors the reference's filtering semantics
    (``rosbag_loading.cpp:44-51``: keep tmin + 1e-6 < t <= tmax).
    """
    conn_topics: dict[int, str] = {}
    conn_types: dict[int, str] = {}
    ev_chunks = []
    cam_info = None

    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS1 V2.0 bag: {magic!r}")
        raw = f.read()

    for header, payload in _iter_records(raw):
        op = header.get("op", b"\x00")[0]
        if op == _OP_CONNECTION:
            cid = struct.unpack("<I", header["conn"])[0]
            topic = header["topic"].decode()
            sub = _read_header(payload)
            conn_topics[cid] = topic
            conn_types[cid] = sub.get("type", b"").decode()
        elif op == _OP_CHUNK:
            compression = header.get("compression", b"none").decode()
            if compression == "none":
                chunk = payload
            elif compression == "bz2":
                chunk = bz2.decompress(payload)
            elif compression == "lz4":
                try:
                    import lz4.frame  # type: ignore

                    chunk = lz4.frame.decompress(payload)
                except ImportError as e:
                    raise RuntimeError(
                        "bag uses lz4 compression; lz4 module unavailable"
                    ) from e
            else:
                raise ValueError(f"unknown chunk compression {compression!r}")
            for h2, p2 in _iter_records(chunk):
                op2 = h2.get("op", b"\x00")[0]
                if op2 == _OP_CONNECTION:
                    cid = struct.unpack("<I", h2["conn"])[0]
                    topic = h2["topic"].decode()
                    conn_topics[cid] = topic
                    sub = _read_header(p2)
                    conn_types[cid] = sub.get("type", b"").decode()
                elif op2 == _OP_MSG:
                    cid = struct.unpack("<I", h2["conn"])[0]
                    topic = conn_topics.get(cid, "")
                    if topic == events_topic:
                        ev_chunks.append(_parse_event_array(p2))
                    elif (
                        camera_info_topic
                        and topic == camera_info_topic
                        and cam_info is None
                    ):
                        cam_info = _parse_camera_info(p2)

    if ev_chunks:
        t = np.concatenate([c[0] for c in ev_chunks])
        x = np.concatenate([c[1] for c in ev_chunks])
        y = np.concatenate([c[2] for c in ev_chunks])
        pol = np.concatenate([c[3] for c in ev_chunks])
    else:
        t = np.zeros(0)
        x = y = np.zeros(0, np.int32)
        pol = np.zeros(0, np.int8)

    m = (t > tmin + 1e-6) & (t <= tmax)
    t, x, y, pol = t[m], x[m], y[m], pol[m]
    order = np.argsort(t, kind="stable")
    return (t[order], x[order], y[order], pol[order]), cam_info


def write_rosbag(path: str, events_topic: str, t, x, y, pol, chunk_events=50000,
                 width=None, height=None):
    """Write a minimal uncompressed ROS1 bag with dvs_msgs/EventArray messages
    (for round-trip tests and interop with the reference)."""
    t = np.asarray(t, np.float64)
    x = np.asarray(x)
    y = np.asarray(y)
    pol = np.asarray(pol)
    width = int(width if width is not None else (x.max() + 1 if len(x) else 1))
    height = int(height if height is not None else (y.max() + 1 if len(y) else 1))

    def field(k: str, v: bytes) -> bytes:
        b = k.encode() + b"=" + v
        return struct.pack("<I", len(b)) + b

    def record(header_fields: dict, payload: bytes) -> bytes:
        hdr = b"".join(field(k, v) for k, v in header_fields.items())
        return (
            struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(payload)) + payload
        )

    def timeval(ts: float) -> bytes:
        sec = int(ts)
        nsec = int(round((ts - sec) * 1e9))
        if nsec >= 1_000_000_000:
            sec, nsec = sec + 1, nsec - 1_000_000_000
        return struct.pack("<II", sec, nsec)

    conn_hdr = {
        "op": b"\x07",
        "conn": struct.pack("<I", 0),
        "topic": events_topic.encode(),
    }
    conn_payload = b"".join(
        [
            field("topic", events_topic.encode()),
            field("type", b"dvs_msgs/EventArray"),
            field("md5sum", b"5e8beee5a6c107e504c2e78903c224b8"),
            field("message_definition", b""),
        ]
    )

    chunks = []
    for lo in range(0, len(t), chunk_events):
        hi = min(lo + chunk_events, len(t))
        n = hi - lo
        rec = np.zeros(
            n,
            dtype=np.dtype(
                [("x", "<u2"), ("y", "<u2"), ("sec", "<u4"), ("nsec", "<u4"), ("pol", "u1")]
            ),
        )
        rec["x"], rec["y"] = x[lo:hi], y[lo:hi]
        sec = t[lo:hi].astype(np.int64)
        rec["sec"] = sec
        rec["nsec"] = np.round((t[lo:hi] - sec) * 1e9).astype(np.int64)
        rec["pol"] = np.asarray(pol[lo:hi] > 0, np.uint8)
        body = (
            struct.pack("<I", 0)  # header.seq
            + timeval(t[lo])  # header.stamp
            + struct.pack("<I", 0)  # frame_id ""
            + struct.pack("<II", height, width)
            + struct.pack("<I", n)
            + rec.tobytes()
        )
        msg = record(
            {"op": b"\x02", "conn": struct.pack("<I", 0), "time": timeval(t[lo])},
            body,
        )
        chunks.append(msg)

    inner = record(conn_hdr, conn_payload) + b"".join(chunks)
    chunk_rec = record(
        {
            "op": b"\x05",
            "compression": b"none",
            "size": struct.pack("<I", len(inner)),
        },
        inner,
    )
    bag_header = record(
        {
            "op": b"\x03",
            "index_pos": struct.pack("<Q", 0),
            "conn_count": struct.pack("<I", 1),
            "chunk_count": struct.pack("<I", 1),
        },
        b" " * 4096,
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(bag_header)
        f.write(chunk_rec)
