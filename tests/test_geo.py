"""Geodesy helpers used by the kitti/highbay loaders: UTM projection and
solar position (dependency-free replacements for utm/pvlib)."""
import datetime

import numpy as np

from ingp_tpu.data.highbay import latlon_to_utm
from ingp_tpu.data.kitti360 import solar_position, _euler_xyz


def test_utm_central_meridian_easting():
    # on a zone's central meridian the easting is exactly 500 km
    east, north = latlon_to_utm(45.0, 3.0)  # zone 31, center 3E
    np.testing.assert_allclose(east, 500000.0, atol=0.5)
    assert 4.9e6 < north < 5.0e6  # 45N is ~4.98e6 m from the equator


def test_utm_local_distances_match_geodesics():
    # 0.01 deg of latitude ~= 1111.9 m of northing
    e1, n1 = latlon_to_utm(49.0, 8.41)
    e2, n2 = latlon_to_utm(49.01, 8.41)
    np.testing.assert_allclose(n2 - n1, 1111.9, rtol=6e-3)
    # 0.01 deg of longitude at 49N ~= 1111.9*cos(49 deg) m of easting
    e3, n3 = latlon_to_utm(49.0, 8.42)
    np.testing.assert_allclose(e3 - e1, 1111.9 * np.cos(np.radians(49)),
                               rtol=6e-3)


def test_utm_vectorized():
    lat = np.array([48.0, 49.0, 50.0])
    lon = np.array([8.4, 8.4, 8.4])
    east, north = latlon_to_utm(lat, lon)
    assert east.shape == (3,)
    assert np.all(np.diff(north) > 1e5)


def test_solar_position_equinox_noon():
    # near the March 2024 equinox at solar noon on the prime meridian,
    # the sun is nearly overhead at the equator
    when = datetime.datetime(2024, 3, 20, 12, 7,
                             tzinfo=datetime.timezone.utc)
    zen, azi = solar_position(0.0, 0.0, when)
    assert zen < 2.0
    # and due south from a northern latitude
    zen2, azi2 = solar_position(49.0, 0.0, when)
    assert abs(zen2 - 49.0) < 2.0
    assert abs(azi2 - 180.0) < 5.0


def test_solar_position_night():
    when = datetime.datetime(2024, 3, 20, 0, 0,
                             tzinfo=datetime.timezone.utc)
    zen, _ = solar_position(49.0, 0.0, when)
    assert zen > 90.0  # below the horizon


def test_euler_xyz_matches_scipy():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(0)
    for _ in range(5):
        rx, ry, rz = rng.uniform(-np.pi, np.pi, 3)
        got = _euler_xyz(rx, ry, rz)
        want = Rotation.from_euler("xyz", [rx, ry, rz]).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-10)
