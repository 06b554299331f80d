"""Half-space / circle / polygon geometry (geometry.f90's test_geometry
invariants)."""

import numpy as np

from kiwi_tpu import geometry as gm


def test_point_in_halfspace_and_constraints():
    hs_p = np.array([0.0, 0.0, 1500.0])
    hs_n = np.array([0.0, 0.0, -1.0])  # allowed side: z >= 1500 (normal points out)
    assert gm.point_in_halfspace(np.array([0.0, 0.0, 2000.0]), hs_p, hs_n)
    assert not gm.point_in_halfspace(np.array([0.0, 0.0, 1000.0]), hs_p, hs_n)
    cons = [(hs_p, hs_n), (np.array([0, 0, 30e3]), np.array([0.0, 0, 1.0]))]
    assert gm.point_in_constraints(np.array([0, 0, 10e3]), cons)
    assert not gm.point_in_constraints(np.array([0, 0, 40e3]), cons)


def test_circle_polygon_area_and_trim():
    r = 2000.0
    center = np.zeros(3)
    transform = np.eye(3) * r
    poly = gm.circle_to_polygon(center, transform, 180)
    area = gm.polygon_area(poly)
    np.testing.assert_allclose(area, np.pi * r * r, rtol=1e-3)

    # trim by a plane through the center -> half the area
    half = gm.trim_polygon(poly, np.zeros(3), np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(gm.polygon_area(half), area / 2.0, rtol=2e-2)

    # trim to a quarter with two half-spaces
    quarter = gm.trim_polygon_multi(
        poly, [(np.zeros(3), np.array([1.0, 0, 0])), (np.zeros(3), np.array([0.0, 1.0, 0]))])
    np.testing.assert_allclose(gm.polygon_area(quarter), area / 4.0, rtol=4e-2)

    lo, hi = gm.polygon_box(poly)
    np.testing.assert_allclose(hi[:2], [r, r], rtol=1e-3)
    np.testing.assert_allclose(lo[:2], [-r, -r], rtol=1e-3)


def test_piercing_and_nearest_point():
    a = np.array([0.0, 0.0, -1.0])
    b = np.array([0.0, 0.0, 3.0])
    p, between, parallel, a_in, b_in = gm.piercing_point(
        a, b, np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(p, [0, 0, 1.0], atol=1e-12)
    assert between and not parallel
    assert a_in and not b_in  # inside = the side the normal points away from

    square = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]], float)
    np.testing.assert_allclose(
        gm.nearest_point_on_polygon(square, np.array([1.0, -3.0, 0.0])),
        [1.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(
        gm.nearest_point_on_polygon(square, np.array([5.0, 5.0, 0.0])),
        [2.0, 2.0, 0.0], atol=1e-9)
