"""Seeding long tail, restart, readers long tail, exports, CLI
(mirrors reference tests/models/test_seed.py, test_io.py,
tests/readers lazy/shape/operator suites)."""

import json
import subprocess
import sys
from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.fields import (ConstantReader, ShapeReader, LazyReader,
                                  reader_from_url, combine_add,
                                  ScaledReader, CurrentFromTrack)

T0 = datetime(2020, 5, 1)
TORSK = ("/root/reference/tests/test_data/shapefile_spawning_areas/"
         "Torsk.shp")


def _sim():
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("drift:vertical_advection", False)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.5,
                                 "y_sea_water_velocity": 0.0}))
    return o


# ------------------------------------------------------------- seeding ----

def test_seed_from_shapefile():
    from opendrift_tpu.utils.shapefile import shapefile_polygons
    polys = shapefile_polygons(TORSK)
    assert len(polys) > 0
    o = _sim()
    o.seed_from_shapefile(TORSK, number=300, time=T0)
    assert o.num_elements_scheduled() == 300
    # all seeded points inside the polygons' overall bbox
    allpts = np.vstack(polys)
    s = o._seedings
    lons = np.concatenate([x["lon"] for x in s])
    lats = np.concatenate([x["lat"] for x in s])
    assert (lons >= allpts[:, 0].min() - 0.01).all()
    assert (lons <= allpts[:, 0].max() + 0.01).all()
    assert (lats >= allpts[:, 1].min() - 0.01).all()


def test_seed_from_geojson():
    o = _sim()
    gj = {"type": "Feature",
          "properties": {"time": "2020-05-01T00:00:00"},
          "geometry": {"type": "Point", "coordinates": [4.0, 60.0]}}
    o.seed_from_geojson(json.dumps(gj), number=10)
    assert o.num_elements_scheduled() == 10


def test_seed_from_wkt():
    o = _sim()
    o.seed_from_wkt("POLYGON ((4 60, 4.5 60, 4.5 60.3, 4 60.3, 4 60))",
                    time=T0, number=50)
    assert o.num_elements_scheduled() == 50


def test_seed_repeated_segment():
    o = _sim()
    o.seed_repeated_segment([4.0, 4.5], [60.0, 60.2], start_time=T0,
                            end_time=T0 + timedelta(hours=2),
                            time_interval=timedelta(hours=1),
                            number_per_segment=10)
    assert o.num_elements_scheduled() == 30


def test_restart_from_file(tmp_path):
    """Run, export, continue from file; continued elements start where
    the first run ended (reference basemodel/__init__.py:1681-1744)."""
    path = str(tmp_path / "leg1.nc")
    o = _sim()
    o.seed_elements(4.0, 60.0, number=5, time=T0)
    o.run(duration=timedelta(hours=5), time_step=3600, outfile=path)
    end_lon = o.result["lon"].values[:, -1]

    o2 = _sim()
    o2.seed_from_file(path)
    assert o2.num_elements_scheduled() == 5
    np.testing.assert_allclose(
        np.concatenate([s["lon"] for s in o2._seedings]), end_lon,
        atol=1e-5)
    o2.run(duration=timedelta(hours=5), time_step=3600)
    # drift continues eastward from leg-1 end
    assert (o2.result["lon"].values[:, -1] > end_lon + 0.05).all()


# ------------------------------------------------------------- readers ----

def test_shape_reader_landmask_stranding():
    """Polygons act as land: particles drifting into them strand."""
    shape = ShapeReader(TORSK, resolution_deg=0.01)
    from opendrift_tpu.utils.shapefile import shapefile_polygons
    polys = shapefile_polygons(TORSK)
    big = max(polys, key=len)
    clon = big[:, 0].mean()
    clat = big[:, 1].mean()
    o = OceanDrift(loglevel=40)
    o.set_config("drift:vertical_advection", False)
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.5,
                                 "y_sea_water_velocity": 0.0}))
    o.add_reader(shape)
    # seed just west of the polygon centre, drifting east into it
    o.seed_elements(clon - 0.4, clat, number=10, time=T0)
    o.run(duration=timedelta(hours=48), time_step=3600)
    status = o.result["status"].values[:, -1]
    stranded = o.status_categories.index("stranded")
    assert (status == stranded).sum() > 0


def test_lazy_reader():
    calls = []

    def ctor():
        calls.append(1)
        return ConstantReader({"x_sea_water_velocity": 1.0,
                               "y_sea_water_velocity": 0.0})
    lr = LazyReader(ctor, name="lazy_test")
    assert lr.is_lazy
    assert not calls          # nothing constructed yet
    _ = lr.sample             # first attribute access initialises
    assert calls == [1]
    assert not lr.is_lazy


def test_reader_factory(tmp_path):
    arctic = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
              "Arctic20_1to5Feb_2016.nc")
    r = reader_from_url(arctic)
    assert "x_sea_water_velocity" in r.variables
    nordic = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
              "Nordic_subset.nc")
    r2 = reader_from_url(nordic)
    from opendrift_tpu.fields import ROMSReader
    assert isinstance(r2, ROMSReader)   # probed as ROMS
    with pytest.raises(FileNotFoundError):
        reader_from_url("/no/such/file.nc")


def test_reader_operators():
    import jax.numpy as jnp
    a = ConstantReader({"x_sea_water_velocity": 0.3,
                        "y_sea_water_velocity": 0.0})
    b = ConstantReader({"x_sea_water_velocity": 0.2,
                        "y_sea_water_velocity": 0.1})
    c = combine_add(a, b)
    c.set_run_epoch(T0)
    vals, cov = c.sample(c.device_state(), ["x_sea_water_velocity"],
                         jnp.float32(0.0), jnp.zeros(3), jnp.zeros(3),
                         jnp.zeros(3))
    np.testing.assert_allclose(vals["x_sea_water_velocity"], 0.5)
    s = ScaledReader(a, scale=2.0, offset=0.1)
    s.set_run_epoch(T0)
    vals, _ = s.sample(s.device_state(), ["x_sea_water_velocity"],
                       jnp.float32(0.0), jnp.zeros(2), jnp.zeros(2),
                       jnp.zeros(2))
    np.testing.assert_allclose(vals["x_sea_water_velocity"], 0.7)


def test_current_from_track():
    """A synthetic eastward drifter track inverts to ~0.5 m/s current."""
    times = [T0 + timedelta(hours=h) for h in range(4)]
    lons = [4.0, 4.0323, 4.0646, 4.0969]  # ~0.5 m/s at 60N
    lats = [60.0] * 4
    r = CurrentFromTrack(lons, lats, times)
    import jax.numpy as jnp
    r.set_run_epoch(T0)
    vals, _ = r.sample(r.device_state(), ["x_sea_water_velocity",
                                          "y_sea_water_velocity"],
                       jnp.float32(1800.0), jnp.zeros(1), jnp.zeros(1),
                       jnp.zeros(1))
    assert abs(float(vals["x_sea_water_velocity"][0]) - 0.5) < 0.05
    assert abs(float(vals["y_sea_water_velocity"][0])) < 0.02


# -------------------------------------------------------------- exports ---

def test_parquet_roundtrip(tmp_path):
    o = _sim()
    o.seed_elements(4.0, 60.0, number=5, time=T0)
    o.run(duration=timedelta(hours=3), time_step=3600)
    from opendrift_tpu.export.io_parquet import (write_result_parquet,
                                                 read_result_parquet)
    path = str(tmp_path / "out.parquet")
    write_result_parquet(o.result, path)
    cols, attrs = read_result_parquet(path)
    assert len(cols["lon"]) == 5 * 4
    assert attrs["opendrift_class"] == "OceanDrift"


# ------------------------------------------------------------------ CLI ---

def test_cli_plot(tmp_path):
    path = str(tmp_path / "run.nc")
    o = _sim()
    o.seed_elements(4.0, 60.0, number=5, time=T0)
    o.run(duration=timedelta(hours=3), time_step=3600, outfile=path)
    out = str(tmp_path / "traj.png")
    res = subprocess.run(
        [sys.executable, "-m", "opendrift_tpu.scripts.opendrift_plot",
         path, "-o", out],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr[-800:]
    import os
    assert os.path.exists(out)
