"""Native topology kernels: build, correctness vs NumPy fallbacks, and
CONUS-scale preprocessing speed."""

import time

import numpy as np
import pytest

from troute_tpu import native


def _random_forest(n, n_basins, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.arange(n)
    bounds = np.linspace(0, n, n_basins + 1).astype(np.int64)
    basin_of = np.searchsorted(bounds, idx, side="right") - 1
    basin_end = bounds[basin_of + 1] - 1
    hop = rng.integers(1, 5, n)
    j = np.minimum(idx + hop, basin_end)
    down = j.astype(np.int32)
    down[idx == basin_end] = -1
    return down


def _numpy_levels(down):
    n = down.size
    indeg = np.zeros(n, np.int64)
    valid = down >= 0
    np.add.at(indeg, down[valid], 1)
    level = np.zeros(n, np.int32)
    remaining = indeg.copy()
    frontier = np.flatnonzero(remaining == 0)
    lvl = 0
    while frontier.size:
        level[frontier] = lvl
        ds = down[frontier]
        ds = ds[ds >= 0]
        if ds.size:
            np.subtract.at(remaining, ds, 1)
            frontier = np.unique(ds[remaining[ds] == 0])
        else:
            frontier = np.empty(0, np.int64)
        lvl += 1
    return level


def test_native_builds():
    assert native.available(), "g++ toolchain present, lib must build"


def test_levels_match_numpy():
    down = _random_forest(5000, 20)
    got = native.wavefront_levels(down)
    np.testing.assert_array_equal(got, _numpy_levels(down))


def test_components_consistent():
    down = _random_forest(5000, 20)
    labels = native.connected_components(down)
    # same downstream tree -> same label; distinct basins -> distinct
    for i in range(0, 5000, 97):
        d = down[i]
        if d >= 0:
            assert labels[i] == labels[d]
    assert len(np.unique(labels)) == 20


def test_invert_matches_downstream():
    down = _random_forest(3000, 10)
    up = native.invert_downstream(down)
    for v in range(3000):
        ups = up[v][up[v] >= 0]
        for u in ups:
            assert down[u] == v
    counts = np.bincount(down[down >= 0], minlength=3000)
    assert up.shape[1] == counts.max()


def test_cycle_detected():
    down = np.array([1, 0], np.int32)
    with pytest.raises(ValueError):
        native.wavefront_levels(down)


def test_conus_scale_speed():
    down = _random_forest(2_729_077, 14_713, seed=3)
    t0 = time.time()
    lv = native.wavefront_levels(down)
    labels = native.connected_components(down)
    up = native.invert_downstream(down)
    elapsed = time.time() - t0
    assert lv.max() > 10 and len(np.unique(labels)) == 14_713
    assert up.shape[0] == down.size
    # native preprocessing of the full CONUS graph in well under a second
    assert elapsed < 5.0, f"native preprocessing too slow: {elapsed:.1f}s"
