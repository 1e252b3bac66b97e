"""Tests for boundary reconstruction, 2D metrics, and observability."""

import numpy as np

from cindm_tpu.data.airfoil import boundary_mask_offset
from cindm_tpu.physics.bdim import ellipse_coords
from cindm_tpu.utils import (
    MetricTracker,
    Printer,
    confidence_interval_95,
    filter_isolated_points,
    find_clusters,
    metric,
    metric_batch,
    polygons_overlap,
    reconstruct_boundary,
)


def test_filter_isolated_points():
    m = np.zeros((10, 10), np.float32)
    m[5, 5] = 1  # isolated
    m[0:3, 0:3] = 1  # block
    out = filter_isolated_points(m)
    assert out[5, 5] == 0
    assert out[1, 1] == 1


def test_find_clusters_drops_small():
    m = np.zeros((16, 16), np.float32)
    m[1:5, 1:5] = 1
    m[13, 13] = 1
    labels = find_clusters(m, min_size=4)
    assert labels.max() == 1
    assert labels[2, 2] == 1 and labels[13, 13] == 0


def test_reconstruct_boundary_roundtrip():
    # rasterize a circle, reconstruct, compare radius
    coords = ellipse_coords(30, 30, 20, 1.0)  # radius 10 circle
    mask, offset = boundary_mask_offset(coords, crop=62)
    polys = reconstruct_boundary(mask, offset)
    assert len(polys) == 1
    r = np.linalg.norm(polys[0] - polys[0].mean(0), axis=1)
    np.testing.assert_allclose(r.mean(), 10.0, atol=1.0)


def test_polygons_overlap():
    a = np.zeros((2, 8, 8))
    a[0, :4] = 1
    a[1, 4:] = 1
    assert not polygons_overlap(a)
    a[1, 3] = 1
    assert polygons_overlap(a)


def test_metric_semantics():
    # minimize-mode: large |drag| is bad, large |lift| is good
    assert float(metric(2.0, 1.0)) == -1.0
    assert float(metric(2.0, 1.0, use_frac=True)) == 2.0


def test_metric_batch_shapes():
    forces = np.random.default_rng(0).normal(size=(3, 10, 2, 2))
    drag_min, lift_max, obj_min, frac_max = metric_batch(forces)
    assert np.isfinite([drag_min, lift_max, obj_min, frac_max]).all()


def test_force_coefficients_units():
    # A known force on a chord-10 body at U=1 gives C = F / (0.5 * 10).
    from cindm_tpu.utils.eval2d import chord_lengths, force_coefficients

    poly = ellipse_coords(30, 30, 20, 1.0)  # radius-10 circle → chord 20
    boundaries = np.asarray(poly)[None, None]  # [B=1, K=1, M, 2]
    np.testing.assert_allclose(chord_lengths(boundaries), [[20.0]], atol=1e-5)
    forces = np.zeros((1, 5, 1, 2))
    forces[..., 0] = 15.0  # drag
    forces[..., 1] = -7.5  # lift
    cd, cl = force_coefficients(forces, boundaries)
    np.testing.assert_allclose(cd, 1.5, atol=1e-5)
    np.testing.assert_allclose(cl, -0.75, atol=1e-5)
    # two boundaries normalize by the total chord
    b2 = np.concatenate([boundaries, boundaries + 30.0], axis=1)
    f2 = np.concatenate([forces, forces], axis=2)
    cd2, _ = force_coefficients(f2, b2)
    np.testing.assert_allclose(cd2, 1.5, atol=1e-5)


def test_metric_tracker_ci():
    t = MetricTracker()
    for v in [1.0, 2.0, 3.0]:
        t.add(obj=v)
    mean, ci = t.report()["obj"]
    assert mean == 2.0
    np.testing.assert_allclose(ci, confidence_interval_95([1, 2, 3]), rtol=1e-6)


def test_printer_runs():
    p = Printer()
    p.print("x", is_silent=True)
    with p.phase("y", is_silent=True):
        pass
    assert "y" in p.summary()
