"""Trajectory analysis: wind_drift_factor inversion (reference parity:
opendrift/models/physics_methods.py:28-93)."""

from datetime import datetime, timedelta

import numpy as np

from opendrift_tpu.utils import geodesic
from opendrift_tpu.utils.trajectory import wind_drift_factor_from_trajectory


def _synthetic_trajectory(wdf_true, N=20, dt=600.0,
                          cu=0.3, cv=0.1, wu=8.0, wv=4.0):
    t0 = datetime(2020, 1, 1)
    lat, lon = [60.0], [4.0]
    for _ in range(N - 1):
        la, lo = geodesic.geodesic_step(
            np, np.float64(lat[-1]), np.float64(lon[-1]),
            cu + wdf_true * wu, cv + wdf_true * wv, dt)
        lat.append(float(la))
        lon.append(float(lo))
    return dict(
        time=[t0 + timedelta(seconds=dt * i) for i in range(N)],
        lon=np.array(lon), lat=np.array(lat),
        x_wind=np.full(N, wu), y_wind=np.full(N, wv),
        x_sea_water_velocity=np.full(N, cu),
        y_sea_water_velocity=np.full(N, cv))


def test_wdf_recovered_exactly():
    traj = _synthetic_trajectory(0.03)
    wdf, az = wind_drift_factor_from_trajectory(traj)
    assert len(wdf) == 19
    assert np.allclose(wdf, 0.03, atol=1e-6)
    assert np.all(np.abs(az) < 0.1)  # drift is downwind


def test_wdf_azimuth_offset_sign():
    # drift rotated right of the wind -> positive azimuth offset
    traj = _synthetic_trajectory(0.0)
    # replace motion: pure crosswind drift (wind from south, drift east)
    t0 = datetime(2020, 1, 1)
    N, dt = 10, 600.0
    lat, lon = [60.0], [4.0]
    for _ in range(N - 1):
        la, lo = geodesic.geodesic_step(
            np, np.float64(lat[-1]), np.float64(lon[-1]), 0.3, 0.0, dt)
        lat.append(float(la))
        lon.append(float(lo))
    traj = dict(
        time=[t0 + timedelta(seconds=dt * i) for i in range(N)],
        lon=np.array(lon), lat=np.array(lat),
        x_wind=np.zeros(N), y_wind=np.full(N, 10.0),  # wind to north
        x_sea_water_velocity=np.zeros(N),
        y_sea_water_velocity=np.zeros(N))
    wdf, az = wind_drift_factor_from_trajectory(traj)
    assert np.allclose(az, 90.0, atol=1.0)   # drift 90 deg right of wind
    assert np.allclose(wdf, 0.03, atol=1e-4)  # 0.3/10


def test_wdf_min_period_subsampling():
    traj = _synthetic_trajectory(0.02, N=24)
    wdf, _ = wind_drift_factor_from_trajectory(
        traj, min_period=timedelta(seconds=1200))
    assert np.allclose(wdf, 0.02, atol=1e-5)
