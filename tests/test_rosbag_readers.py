"""Execute the bag/mcap readers for real against fake dependency modules.

The ``rosbags`` / ``mcap`` packages are absent from this image, so the
readers' behavior (reference parity: ``ros_reader.py:38-97``,
``ros2_reader.py:38-90``, ``mcap_reader.py:38-127``) was previously only
import-gated, never executed (VERDICT r1). These tests install minimal
fake modules into ``sys.modules`` that honour the exact API surface the
readers consume — ``rosbags.highlevel.AnyReader`` (connections /
messages / deserialize / topics) and ``mcap.reader.make_reader`` +
``mcap_ros2.reader.read_ros2_messages`` (summary schemas / channels /
statistics) — and feed them REAL PointCloud2 byte payloads, so the
whole decode path (structured dtype from field descriptors, endianness,
NaN drop, range filter, stamp conversion) runs end to end.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# PointCloud2 message double with a real byte payload
# ---------------------------------------------------------------------------


def make_pc2_msg(xyz: np.ndarray, stamp_s: float = 0.0):
    """Build a PointCloud2-like object: x/y/z float32 at offsets 0/4/8,
    point_step 16 (4 pad bytes, as real drivers emit)."""
    n = len(xyz)
    raw = np.zeros(n, dtype={"names": ["x", "y", "z"],
                             "formats": ["<f4", "<f4", "<f4"],
                             "offsets": [0, 4, 8],
                             "itemsize": 16})
    raw["x"], raw["y"], raw["z"] = xyz.T.astype(np.float32)
    field = lambda name, off: types.SimpleNamespace(  # noqa: E731
        name=name, offset=off, datatype=7, count=1)
    sec = int(stamp_s)
    return types.SimpleNamespace(
        fields=[field("x", 0), field("y", 4), field("z", 8)],
        width=n, height=1, point_step=16, is_bigendian=False,
        data=raw.tobytes(),
        header=types.SimpleNamespace(stamp=types.SimpleNamespace(
            sec=sec, nanosec=int(round((stamp_s - sec) * 1e9)))),
    )


CLOUD = np.array([
    [1.0, 0.0, 0.0],     # range 1 — inside [0.5, 10]
    [3.0, 4.0, 0.0],     # range 5 — inside
    [0.1, 0.0, 0.0],     # range 0.1 — below min_range
    [20.0, 0.0, 0.0],    # range 20 — above max_range
    [np.nan, 1.0, 1.0],  # NaN — dropped
])
KEPT = CLOUD[:2]


# ---------------------------------------------------------------------------
# fake rosbags (ROS1 .bag / ROS2 .db3 via AnyReader)
# ---------------------------------------------------------------------------


class _FakeAnyReader:
    """The slice of rosbags.highlevel.AnyReader the readers consume."""

    # (topic, stamp_ns, msg) records, set by the fixture
    RECORDS: list = []
    opened_paths: list = []

    def __init__(self, paths):
        _FakeAnyReader.opened_paths = [str(p) for p in paths]
        self._open = False

    def open(self):
        self._open = True

    def close(self):
        self._open = False

    @property
    def connections(self):
        return [types.SimpleNamespace(topic=t, msgtype="sensor_msgs/msg/PointCloud2")
                for t in dict.fromkeys(t for t, _, _ in self.RECORDS)]

    @property
    def topics(self):
        counts = {}
        for t, _, _ in self.RECORDS:
            counts[t] = counts.get(t, 0) + 1
        return {t: types.SimpleNamespace(msgcount=c) for t, c in counts.items()}

    def messages(self, connections=()):
        assert self._open, "messages() before open()"
        topics = {c.topic for c in connections}
        for t, stamp_ns, msg in self.RECORDS:
            if t in topics:
                # rawdata IS the message here; deserialize is identity
                yield (types.SimpleNamespace(topic=t, msgtype="pc2"),
                       stamp_ns, msg)

    def deserialize(self, rawdata, msgtype):
        return rawdata


@pytest.fixture
def fake_rosbags(monkeypatch):
    mod = types.ModuleType("rosbags")
    hl = types.ModuleType("rosbags.highlevel")
    hl.AnyReader = _FakeAnyReader
    mod.highlevel = hl
    monkeypatch.setitem(sys.modules, "rosbags", mod)
    monkeypatch.setitem(sys.modules, "rosbags.highlevel", hl)
    _FakeAnyReader.RECORDS = [
        ("/other", 10, make_pc2_msg(CLOUD[:1])),
        ("/points", 2_500_000_000, make_pc2_msg(CLOUD)),
        ("/points", 2_600_000_000, make_pc2_msg(CLOUD + 0.25)),
        ("/other", 99, make_pc2_msg(CLOUD[:1])),
    ]
    return _FakeAnyReader


def test_ros1_reader_end_to_end(fake_rosbags, tmp_path):
    from madicp_tpu.utils.rosbag import Ros1Reader

    (tmp_path / "b2.bag").touch()
    (tmp_path / "b10.bag").touch()
    with Ros1Reader(tmp_path, min_range=0.5, max_range=10.0,
                    topic="/points") as r:
        assert len(r) == 2
        # natsorted glob: b2 before b10 (lexicographic would invert)
        assert [p.split("/")[-1] for p in fake_rosbags.opened_paths] == \
            ["b2.bag", "b10.bag"]
        stamp0, pts0 = next(iter(r))
        # rosbags stamps are ns; readers yield SECONDS
        assert stamp0 == pytest.approx(2.5)
        # decode + NaN drop + range filter
        np.testing.assert_allclose(pts0, KEPT, atol=1e-6)
        stamp1, pts1 = r[1]
        assert stamp1 == pytest.approx(2.6)
        assert pts1.shape == (2, 3)


def test_ros2_reader_sequential_contract(fake_rosbags, tmp_path):
    from madicp_tpu.utils.rosbag import Ros2Reader

    (tmp_path / "data.db3").touch()
    with Ros2Reader(tmp_path, min_range=0.5, max_range=10.0,
                    topic="/points") as r:
        with pytest.raises(IndexError, match="sequential"):
            r[1]  # out-of-order read must raise, not silently advance
        _ = r[0]
        with pytest.raises(IndexError, match="next readable index is 1"):
            r[0]  # re-reading a consumed index must raise too
        _ = r[1]


def test_bag_reader_unknown_topic_lists_available(fake_rosbags, tmp_path):
    from madicp_tpu.utils.rosbag import Ros1Reader

    (tmp_path / "a.bag").touch()
    with pytest.raises(ValueError, match=r"/other.*|/points.*"):
        Ros1Reader(tmp_path, topic="/nope")


def test_bag_reader_missing_dep_message(tmp_path):
    from madicp_tpu.utils.rosbag import Ros1Reader

    if "rosbags" in sys.modules:  # the real dep is absent in this image
        pytest.skip("real rosbags installed")
    with pytest.raises(ImportError, match="rosbags"):
        Ros1Reader(tmp_path, topic="/points")


# ---------------------------------------------------------------------------
# fake mcap / mcap_ros2
# ---------------------------------------------------------------------------


class _FakeMcapReader:
    def get_summary(self):
        schemas = {
            1: types.SimpleNamespace(id=1, name="sensor_msgs/msg/PointCloud2"),
            2: types.SimpleNamespace(id=2, name="std_msgs/msg/String"),
        }
        channels = {
            10: types.SimpleNamespace(topic="/points", schema_id=1),
            11: types.SimpleNamespace(topic="/chatter", schema_id=2),
        }
        stats = types.SimpleNamespace(
            channel_message_counts={10: len(_MCAP_MSGS), 11: 7})
        return types.SimpleNamespace(
            schemas=schemas, channels=channels, statistics=stats)


_MCAP_MSGS = [
    make_pc2_msg(CLOUD, stamp_s=5.25),
    make_pc2_msg(CLOUD + 0.5, stamp_s=5.35),
]


@pytest.fixture
def fake_mcap(monkeypatch):
    mcap = types.ModuleType("mcap")
    mreader = types.ModuleType("mcap.reader")
    mreader.make_reader = lambda f: _FakeMcapReader()
    mcap.reader = mreader
    ros2 = types.ModuleType("mcap_ros2")
    r2reader = types.ModuleType("mcap_ros2.reader")
    r2reader.read_ros2_messages = lambda path, topics: iter(
        types.SimpleNamespace(ros_msg=m) for m in _MCAP_MSGS)
    ros2.reader = r2reader
    for name, m in [("mcap", mcap), ("mcap.reader", mreader),
                    ("mcap_ros2", ros2), ("mcap_ros2.reader", r2reader)]:
        monkeypatch.setitem(sys.modules, name, m)


def test_mcap_reader_end_to_end(fake_mcap, tmp_path):
    from madicp_tpu.utils.rosbag import McapReader

    (tmp_path / "log.mcap").touch()
    with McapReader(tmp_path, min_range=0.5, max_range=10.0,
                    topic="/points") as r:
        assert len(r) == 2
        out = [r[0], r[1]]
        # header stamp = sec + nanosec*1e-9
        assert out[0][0] == pytest.approx(5.25)
        assert out[1][0] == pytest.approx(5.35)
        np.testing.assert_allclose(out[0][1], KEPT, atol=1e-6)
        with pytest.raises(IndexError, match="sequential"):
            r[0]


def test_mcap_reader_rejects_non_pc2_topic(fake_mcap, tmp_path):
    from madicp_tpu.utils.rosbag import McapReader

    (tmp_path / "log.mcap").touch()
    with pytest.raises(ValueError, match=r"/points"):
        McapReader(tmp_path, topic="/chatter")  # wrong schema; lists pc2 topics
