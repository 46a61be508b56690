"""Small product-surface parity tests: config fuzzy suggestions and
validation errors (reference: opendrift/config.py:90-117,
tests/models/test_basemodel.py test_config_suggestion /
test_invalid_config), the hierarchical timer report (reference
opendrift/timer.py:4-34, performance() basemodel/__init__.py:809-839),
and the hodograph CLI script (reference opendrift/scripts/hodograph.py).
"""

import sys
from datetime import timedelta

import numpy as np
import pytest


def _sim():
    from opendrift_tpu.models.oceandrift import OceanDrift
    return OceanDrift(loglevel=50)


def test_config_suggestion_on_typo():
    o = _sim()
    with pytest.raises(ValueError) as ei:
        o.set_config("drift:advection_sceme", "euler")
    # difflib near-miss hint names the real key
    assert "drift:advection_scheme" in str(ei.value)


def test_config_enum_suggestion():
    o = _sim()
    with pytest.raises(ValueError) as ei:
        o.set_config("drift:advection_scheme", "runge-kutta5")
    msg = str(ei.value)
    assert "runge-kutta4" in msg or "runge-kutta" in msg


def test_config_type_and_range_validation():
    o = _sim()
    with pytest.raises(ValueError):
        o.set_config("drift:vertical_mixing", "not-a-bool")
    with pytest.raises(ValueError):
        o.set_config("drift:horizontal_diffusivity", -5.0)  # min 0
    with pytest.raises(ValueError):
        o.set_config("no:such:key", 1)


def test_performance_report_after_run():
    from opendrift_tpu.fields.analytic import ConstantReader
    o = _sim()
    o.add_reader(ConstantReader({"x_sea_water_velocity": 0.1,
                                 "y_sea_water_velocity": 0.0,
                                 "land_binary_mask": 0.0}))
    from datetime import datetime
    o.seed_elements(lon=4.0, lat=60.0, time=datetime(2021, 1, 1),
                    number=10)
    o.run(duration=timedelta(hours=1), time_step=600)
    report = o.performance()
    assert isinstance(report, str) and len(report.splitlines()) >= 2
    # hierarchical categories render indented
    assert any(line.startswith(" ") for line in report.splitlines())


def test_hodograph_script(tmp_path, monkeypatch):
    from opendrift_tpu.scripts import hodograph
    out = str(tmp_path / "hodo.png")
    monkeypatch.setattr(sys, "argv", [
        "hodograph", "oscillating://x_sea_water_velocity?amplitude=0.5"
        "&period_seconds=3600", "--lon", "3.0", "--lat", "60.0",
        "-o", out])
    hodograph.main()
    import os
    assert os.path.getsize(out) > 1000


def test_readerinfo_script(tmp_path, monkeypatch, capsys):
    from opendrift_tpu.scripts import readerinfo
    monkeypatch.setattr(sys, "argv", [
        "readerinfo", "constant://x_sea_water_velocity=0.3"])
    readerinfo.main()
    txt = capsys.readouterr().out
    assert "x_sea_water_velocity" in txt


def test_reader_plot(tmp_path):
    """Standalone reader.plot (reference basereader/__init__.py:240)."""
    import os
    from opendrift_tpu.fields.roms import ROMSReader
    path = ("/root/reference/tests/test_data/2Feb2016_Nordic_sigma_3d/"
            "Nordic_subset.nc")
    import pytest
    if not os.path.exists(path):
        pytest.skip("reference test data unavailable")
    r = ROMSReader(path)
    out = tmp_path / "reader.png"
    r.plot(variable="x_sea_water_velocity", filename=str(out))
    assert out.stat().st_size > 1000


def test_current_from_drifter_subtracts_stokes():
    """(reference reader_current_from_drifter.py): drifter-track
    inversion minus the monochromatic Stokes profile from a wave
    reader."""
    from datetime import datetime, timedelta
    import numpy as np
    from opendrift_tpu.fields.analytic import (CurrentFromDrifter,
                                               ConstantReader)
    t0 = datetime(2020, 1, 1)
    times = [t0 + timedelta(hours=i) for i in range(6)]
    lon = 4.0 + 0.5 * 3600 * np.arange(6) / (111320 * np.cos(
        np.radians(60.0)))
    lat = np.full(6, 60.0)
    r = CurrentFromDrifter(lon, lat, times)
    np.testing.assert_allclose(r._u, 0.5, atol=0.01)
    waves = ConstantReader({
        "sea_surface_wave_significant_height": 2.0,
        "sea_surface_wave_stokes_drift_x_velocity": 0.1,
        "sea_surface_wave_stokes_drift_y_velocity": 0.0,
        "sea_surface_wave_mean_period_from_variance_spectral_density_"
        "inverse_frequency_moment": 8.0})
    r2 = CurrentFromDrifter(lon, lat, times, waves=waves, z=0.0)
    np.testing.assert_allclose(r2._u, r._u - 0.1, atol=1e-5)
    # at depth the Stokes contribution decays
    r3 = CurrentFromDrifter(lon, lat, times, waves=waves, z=-5.0)
    assert np.all(r3._u > r2._u) and np.all(r3._u < r._u)
    # NaN positions are dropped like the reference
    lon_bad = lon.copy(); lon_bad[2] = np.nan
    r4 = CurrentFromDrifter(lon_bad, lat, times)
    assert len(r4._u) == 4


def test_reader_sample_at():
    """BaseReader.sample_at: host-side positions->values convenience
    (the standalone analogue of reference get_variables_interpolated,
    basereader/variables.py:860); outside coverage -> NaN."""
    from datetime import datetime, timedelta
    import numpy as np
    from opendrift_tpu.fields import ArrayReader

    t0 = datetime(2021, 1, 1)
    ny = nx = 12
    uu = np.full((2, ny, nx), 0.7, np.float32)
    r = ArrayReader({"x_sea_water_velocity": uu},
                    x=np.linspace(4.0, 5.0, nx),
                    y=np.linspace(60.0, 61.0, ny),
                    times=[t0, t0 + timedelta(hours=6)])
    out = r.sample_at([4.5, 20.0], [60.5, 60.5], t0)
    vals = out["x_sea_water_velocity"]
    assert abs(vals[0] - 0.7) < 1e-5
    assert np.isnan(vals[1])          # outside coverage
