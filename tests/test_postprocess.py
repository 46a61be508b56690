"""Post-processing and plotting: density maps, FTLE, figures, animations
(mirrors reference tests using the double gyre, the canonical LCS field)."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import DoubleGyre, ConstantReader


@pytest.fixture(scope="module")
def gyre_run():
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(dg)
    lon, lat = dg.xy2lonlat([0.9], [0.5])
    o.seed_elements(lon, lat, radius=0.15, number=400,
                    time=dg.initial_time)
    o.run(duration=timedelta(seconds=10), time_step=0.25)
    return o


def test_histogram_counts(gyre_run):
    H, lon_c, lat_c = gyre_run.get_histogram(pixelsize_m=0.2)
    # every frame's histogram sums to the number of active elements
    assert H.shape[0] == gyre_run.result.dims["time"]
    np.testing.assert_allclose(H[0].sum(), 400)
    np.testing.assert_allclose(H[-1].sum(), 400)


def test_density_array_and_netcdf(gyre_run, tmp_path):
    H_surf, H_sub, H_str, lons, lats = \
        gyre_run.get_density_array(pixelsize_m=0.2)
    assert H_surf.sum(axis=(1, 2)).max() == 400  # all at surface
    assert H_sub.sum() == 0
    path = tmp_path / "density.nc"
    gyre_run.write_netcdf_density_map(str(path), pixelsize_m=0.2)
    from opendrift_tpu.utils import ncio
    ds = ncio.open_dataset(str(path))
    assert "density_surface" in ds.variables
    total = ds.variables["density_surface"][:].sum()
    assert total == pytest.approx(400 * gyre_run.result.dims["time"])
    ds.close()


def test_residence_time(gyre_run):
    R, lons, lats = gyre_run.get_residence_time(pixelsize_m=0.2)
    assert R.sum() == pytest.approx(400 * gyre_run.result.dims["time"])


def test_center_of_gravity(gyre_run):
    mlon, mlat, slon, slat = gyre_run.center_of_gravity()
    assert np.isfinite(mlon).all()
    assert (slon >= 0).all()


def test_ftle_double_gyre():
    """FTLE of the double gyre: ridge structure with positive maxima —
    the canonical LCS benchmark (reference example_double_gyre_LCS)."""
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:advection_scheme", "runge-kutta4")
    o.set_config("drift:vertical_advection", False)
    dg = DoubleGyre(epsilon=0.25, omega=0.628, A=0.1)
    o.add_reader(dg)
    lcs = o.calculate_ftle(reader=dg, delta=0.05,
                           domain=[0.0, 2.0, 0.0, 1.0],
                           time=dg.initial_time, time_step=0.2,
                           duration=timedelta(seconds=8), ALCS=False)
    R = lcs["RLCS"][0]
    assert np.isfinite(R).all()
    assert R.max() > 0.1            # attracting/repelling ridges exist
    assert R.max() > 3 * np.median(np.abs(R))  # ridge structure, not flat


def test_plot_and_animation(gyre_run, tmp_path):
    png = tmp_path / "traj.png"
    gyre_run.plot(filename=str(png), hide_landmask=True)
    assert png.exists() and png.stat().st_size > 10000
    gif = tmp_path / "traj.gif"
    # subsample: animate only works on the full result; keep it small
    gyre_run.animation(filename=str(gif), hide_landmask=True, fps=5)
    assert gif.exists() and gif.stat().st_size > 10000


def test_plot_property(gyre_run, tmp_path):
    png = tmp_path / "prop.png"
    gyre_run.plot_property("lat", filename=str(png), mean=True)
    assert png.exists()


def test_vertical_distribution_plots(tmp_path):
    """plot/animate_vertical_distribution + get_diffusivity_profile
    (reference oceandrift.py:385-712)."""
    import numpy as np
    from datetime import datetime, timedelta
    from opendrift_tpu.models import OceanDrift
    from opendrift_tpu.fields.analytic import ConstantReader
    o = OceanDrift(loglevel=40)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.0,
                                 "y_sea_water_velocity": 0.0,
                                 "land_binary_mask": 0.0,
                                 "sea_floor_depth_below_sea_level": 50.0}))
    o.set_config("drift:vertical_mixing", True)
    o.set_config("vertical_mixing:diffusivitymodel",
                 "windspeed_Sundby1983")
    o.set_config("environment:constant:x_wind", 10.0)
    o.set_config("environment:constant:y_wind", 0.0)
    o.seed_elements(lon=4, lat=60, z=-5.0, number=300,
                    time=datetime(2020, 1, 1))
    o.run(duration=timedelta(hours=2), time_step=600)
    o.plot_vertical_distribution(filename=str(tmp_path / "vd.png"))
    o.animate_vertical_distribution(filename=str(tmp_path / "vd.gif"),
                                    subsamplingstep=4)
    K = o.get_diffusivity_profile("windspeed_Sundby1983",
                                  np.linspace(0, 30, 10), [5.0, 10.0])
    assert K.shape == (10, 2) and np.isfinite(K).all()

    from opendrift_tpu.models import Leeway
    lw = Leeway(loglevel=40)
    lw.plot_capsize_probability(filename=str(tmp_path / "cap.png"))
