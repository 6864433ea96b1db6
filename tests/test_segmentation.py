"""Segmentation tests on synthetic range-image scenes: projection, ground
removal, component labeling, validity filtering (ref semantics:
ImageProjection.h:281-531)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.core import segmentation as seg

SENSOR = seg.SensorModel(n_scan=16, horizon=360, ang_res_y=2.0, ang_bottom=15.0,
                         ground_rows=5)


def make_scene(rng):
    """Ground plane + one large wall + a tiny floating clutter cluster."""
    pts = []
    # ground: rays hitting z=-1.5 plane (sensor at origin)
    for az in np.linspace(-np.pi, np.pi, 500):
        for vert_deg in [-15, -13, -11, -9, -7]:
            v = np.radians(vert_deg)
            t = -1.5 / np.sin(v)
            if 0 < t < 60:
                pts.append([t * np.cos(v) * np.cos(az), t * np.cos(v) * np.sin(az),
                            -1.5])
    # wall: large vertical plane at x=10, |y|<6, z in [-1.5, 3]
    for y in np.linspace(-6, 6, 120):
        for z in np.linspace(-1.4, 3, 25):
            pts.append([10.0, y, z])
    n_wall = 120 * 25
    # tiny clutter: 3 points far away, isolated
    clutter = [[25.0, 20.0, 2.0], [25.1, 20.1, 2.0], [25.2, 20.0, 2.1]]
    pts.extend(clutter)
    pts = np.asarray(pts, np.float32)
    pts += rng.normal(scale=0.005, size=pts.shape).astype(np.float32)
    return pts, n_wall


def test_projection_fills_cells(rng):
    pts, _ = make_scene(rng)
    img = seg.project(jnp.asarray(pts), jnp.ones(len(pts), bool), SENSOR)
    assert int(img.valid.sum()) > 500
    r = np.asarray(img.rng)
    v = np.asarray(img.valid)
    assert (r[v] > 0).all()
    # winning point's actual range matches the cell range
    p = np.asarray(img.pts)[v]
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), r[v], rtol=1e-4)


def test_ground_detected(rng):
    pts, _ = make_scene(rng)
    img = seg.project(jnp.asarray(pts), jnp.ones(len(pts), bool), SENSOR)
    g = np.asarray(seg.ground_mask(img, SENSOR))
    # ground cells exist in the low rings and their points are near z=-1.5
    assert g.sum() > 100
    gz = np.asarray(img.pts)[g][:, 2]
    assert (np.abs(gz + 1.5) < 0.2).mean() > 0.9


def test_wall_is_one_component_and_clutter_removed(rng):
    pts, _ = make_scene(rng)
    cloud = seg.segment_cloud(jnp.asarray(pts), jnp.ones(len(pts), bool), SENSOR, 4096)
    got = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    # wall survives
    wall_pts = got[np.abs(got[:, 0] - 10.0) < 0.5]
    assert len(wall_pts) > 200
    # clutter (3 isolated points) must be filtered out
    clutter = got[(np.abs(got[:, 0] - 25.0) < 1.0) & (np.abs(got[:, 1] - 20.0) < 1.0)]
    assert len(clutter) == 0
    # subsampled ground present but sparse
    ground = got[np.abs(got[:, 2] + 1.5) < 0.2]
    assert 0 < len(ground) < 600


def test_labels_partition(rng):
    pts, _ = make_scene(rng)
    img = seg.project(jnp.asarray(pts), jnp.ones(len(pts), bool), SENSOR)
    ground = seg.ground_mask(img, SENSOR)
    segmentable = img.valid & ~ground
    labels = np.asarray(seg.label_components(img, segmentable, SENSOR))
    segm = np.asarray(segmentable)
    # every segmentable cell got a label; none elsewhere
    assert (labels[segm] >= 0).all()
    assert (labels[~segm] == -1).all()
    # labels are root flat-indices: each root must be inside its own component
    for lbl in np.unique(labels[segm]):
        rr, cc = divmod(int(lbl), SENSOR.horizon)
        assert labels[rr, cc] == lbl
