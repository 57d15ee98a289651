"""Execute the Open3D-gated viz paths against a fake open3d module.

open3d is absent from this image, so the Visualizer's scene updates
(reference parity: ``visualizer.py:39-111``) and the registration demo's
per-iteration match-line animation (``mad_registration.py:100-133``)
previously ran only as headless no-ops. A minimal fake open3d recording
every call lets the REAL drawing code run: geometry updates, keyframe
marker spheres, trajectory line sets, match lines per ICP iteration.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest


class _Recorder:
    """Object that accepts any attribute/call and records geometry adds."""

    def __init__(self, log):
        self._log = log

    def __getattr__(self, name):
        def call(*a, **k):
            self._log.append((name, a, k))
            if name == "get_render_option":
                return types.SimpleNamespace(
                    point_size=0, background_color=None, line_width=0)
            return None

        return call


class _Geometry:
    kind = "geometry"

    def __init__(self, *a, **k):
        self.ctor_args = (a, k)
        self.points = None
        self.lines = None
        self.colors = None
        self.color = None
        self.transform_applied = None
        for name, val in k.items():  # LineSet(points=..., lines=...)
            setattr(self, name, val)

    def paint_uniform_color(self, c):
        self.color = list(c)

    def transform(self, T):
        self.transform_applied = np.asarray(T)


def make_fake_o3d(log):
    o3d = types.ModuleType("open3d")

    class TriangleMesh(_Geometry):
        @staticmethod
        def create_sphere(radius):
            s = TriangleMesh()
            s.radius = radius
            log.append(("create_sphere", (radius,), {}))
            return s

    o3d.geometry = types.SimpleNamespace(
        PointCloud=_Geometry, LineSet=_Geometry, TriangleMesh=TriangleMesh)
    o3d.utility = types.SimpleNamespace(
        Vector3dVector=lambda x: np.asarray(x),
        Vector2iVector=lambda x: np.asarray(x, dtype=np.int64),
    )
    o3d.visualization = types.SimpleNamespace(
        Visualizer=lambda: _Recorder(log),
        VisualizerWithKeyCallback=lambda: _Recorder(log),
    )
    return o3d


@pytest.fixture
def fake_o3d(monkeypatch):
    log: list = []
    monkeypatch.setitem(sys.modules, "open3d", make_fake_o3d(log))
    import madicp_tpu.utils.visualizer as vizmod

    importlib.reload(vizmod)
    yield log
    # restore the headless module state for other tests
    monkeypatch.delitem(sys.modules, "open3d")
    importlib.reload(vizmod)


def test_visualizer_draws_scene_and_keyframe_markers(fake_o3d):
    from madicp_tpu.utils.visualizer import Visualizer

    v = Visualizer("test")
    assert v.enabled
    scan = np.random.default_rng(0).normal(size=(50, 3))
    kf_pose = np.eye(4)
    kf_pose[:3, 3] = [1.0, 2.0, 3.0]

    v.update(scan, scan + 1.0, np.eye(4), None)
    v.update(scan, scan + 1.0, kf_pose, kf_pose)
    v.close()

    names = [n for n, _, _ in fake_o3d]
    # scene geometry updated both frames
    assert names.count("update_geometry") >= 4
    # exactly one keyframe -> one marker sphere, placed at the kf origin
    assert names.count("create_sphere") == 1
    add_calls = [a for n, a, k in fake_o3d if n == "add_geometry"]
    spheres = [g for (g, *_) in add_calls if getattr(g, "radius", None)]
    assert len(spheres) == 1
    np.testing.assert_allclose(spheres[0].transform_applied, kf_pose)
    assert spheres[0].color == [0.0, 1.0, 0.0]
    # trajectory line set got its two points
    assert len(v._traj_pts) == 2
    assert "destroy_window" in names


def test_mad_registration_viz_draws_match_lines(fake_o3d, monkeypatch):
    import time

    monkeypatch.setattr(time, "sleep", lambda s: None)
    from madicp_tpu.apps import mad_registration

    T = mad_registration.main(points_per_wall=60, seed=42, viz=True)
    # the animated path must still recover the identity ground truth
    np.testing.assert_allclose(T, np.eye(4), atol=5e-3)
    # one LineSet of match lines added per ICP iteration (minus the
    # first-frame None guard): 15 adds, 14 removes
    names = [n for n, _, _ in fake_o3d]
    assert names.count("remove_geometry") == mad_registration.MAX_ITERATIONS - 1
    adds = [a for n, a, k in fake_o3d if n == "add_geometry"]
    line_sets = [g for (g, *_) in adds
                 if isinstance(g, object) and getattr(g, "lines", None) is not None]
    assert len(line_sets) == mad_registration.MAX_ITERATIONS
    # match lines connect moved points (rows 0..n-1) to matches (n..2n-1);
    # the fixture is four walls + floor = 5 surfaces
    n = 60 * 5
    ls = line_sets[-1]
    assert ls.ctor_args[1]["points"].shape == (2 * n, 3)
    np.testing.assert_array_equal(
        ls.ctor_args[1]["lines"][0], [0, n])
    assert "run" in names and "destroy_window" in names
