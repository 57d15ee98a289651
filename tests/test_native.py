"""Native loader + prefetcher: parity with the numpy reference path."""

import numpy as np
import pytest

from madicp_tpu.native import loader
from madicp_tpu.native.prefetch import Prefetcher
from madicp_tpu.utils.kitti import KittiReader, apply_vertical_correction


def _write_bin(path, rng, n=5000):
    pts = rng.normal(scale=30.0, size=(n, 3))
    pts[::17] = np.nan  # NaN records must be dropped
    rec = np.concatenate(
        [pts, rng.random((n, 1))], axis=1
    ).astype(np.float32)
    rec.tofile(path)
    return pts


def _numpy_read(path, min_range, max_range, correct):
    cloud = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
    cloud = cloud.astype(np.float64)
    norms = np.linalg.norm(cloud, axis=1)
    keep = (norms >= min_range) & (norms <= max_range)
    pts = cloud[keep]
    if correct:
        pts = apply_vertical_correction(pts)
    return pts


@pytest.fixture
def bin_dir(tmp_path, rng):
    for i in range(3):
        _write_bin(tmp_path / f"{i:06d}.bin", rng)
    return tmp_path


def test_native_loader_builds():
    assert loader.available(), "g++ is in this image; the loader must build"


@pytest.mark.parametrize("correct", [False, True])
def test_native_matches_numpy(bin_dir, correct):
    if not loader.available():
        pytest.skip("native loader unavailable")
    for f in sorted(bin_dir.glob("*.bin")):
        ours = loader.read_bin(f, 2.0, 80.0, apply_correction=correct)
        ref = _numpy_read(f, 2.0, 80.0, correct)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_kitti_reader_uses_native(bin_dir):
    r = KittiReader(bin_dir, min_range=2.0, max_range=80.0, sensor_hz=10.0)
    stamps, clouds = [], []
    with r:
        for ts, pts in r:
            stamps.append(ts)
            clouds.append(pts)
    assert len(clouds) == 3
    assert stamps == pytest.approx([0.1, 0.2, 0.3])
    ref = _numpy_read(sorted(bin_dir.glob("*.bin"))[0], 2.0, 80.0, False)
    np.testing.assert_allclose(clouds[0], ref, atol=1e-12)


def test_prefetcher_matches_reader(bin_dir):
    plain = list(KittiReader(bin_dir, 2.0, 80.0, sensor_hz=10.0))
    with Prefetcher(KittiReader(bin_dir, 2.0, 80.0, sensor_hz=10.0)) as pf:
        fetched = list(pf)
    assert len(fetched) == len(plain) == 3
    for (t0, p0), (t1, p1) in zip(plain, fetched):
        assert t0 == t1
        np.testing.assert_array_equal(p0, p1)


def test_prefetcher_propagates_errors(bin_dir):
    class Boom:
        def __iter__(self):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        with Prefetcher(Boom()) as pf:
            list(pf)


def test_prefetcher_early_exit_clean(bin_dir):
    """Breaking out of iteration must stop and join the producer without
    draining the whole dataset or leaking a blocked thread."""
    pf = Prefetcher(KittiReader(bin_dir, 2.0, 80.0, sensor_hz=10.0), depth=1)
    with pf:
        for item in pf:
            break  # early exit after one scan
    assert pf._thread is not None and not pf._thread.is_alive()


def test_prefetcher_transform_runs_on_producer():
    """The transform hook stages items on the producer thread."""
    import threading

    from madicp_tpu.native.prefetch import Prefetcher

    main_thread = threading.get_ident()
    seen_threads = []

    def xf(item):
        seen_threads.append(threading.get_ident())
        return (item[0], item[1] * 2)

    items = [(i, float(i)) for i in range(5)]
    with Prefetcher(iter(items), transform=xf) as pf:
        out = list(pf)
    assert out == [(i, 2.0 * i) for i in range(5)]
    assert all(t != main_thread for t in seen_threads)
