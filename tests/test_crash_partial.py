"""Graceful-crash parity: a run that dies mid-loop must retain the
steps computed so far both in the partial output file AND as
``o.result`` (the reference ends gracefully keeping partial results,
reference basemodel/__init__.py:2286-2304)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from opendrift_tpu.models import OceanDrift
from opendrift_tpu.export.io_netcdf import read_result


def test_partial_result_after_midrun_crash(tmp_path):
    o = OceanDrift(loglevel=40)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.4)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.2)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    o.set_config("export:buffer_length", 1)
    n = 8
    o.seed_elements(lon=np.linspace(4.0, 4.5, n),
                    lat=np.linspace(60.0, 60.3, n),
                    time=datetime(2021, 1, 1))

    # the forcing pipeline hard-fails after 5 good windows (a reader
    # raising beyond the quarantine's reach — e.g. the source vanishing)
    real_build = o.env.build_device_states
    calls = {"n": 0}

    def failing_build(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("forcing source vanished mid-run")
        return real_build(*a, **kw)

    o.env.build_device_states = failing_build
    outfile = str(tmp_path / "partial.nc")
    with pytest.raises(RuntimeError, match="vanished"):
        o.run(duration=timedelta(hours=10), time_step=1800,
              time_step_output=1800, outfile=outfile)

    # in-memory partial result (reference keeps self.result)
    assert o.result is not None
    good = o.result["lon"].values
    assert good.shape[0] == n
    n_steps = good.shape[1]
    assert n_steps >= 5
    assert np.isfinite(good).all()
    # elements actually moved during the good steps
    assert np.abs(good[:, -1] - good[:, 0]).max() > 1e-5

    # crash-safe partial file holds the same good steps (the un-
    # finalized file keeps the incremental record layout: time-major)
    ds = read_result(outfile)
    vals = ds["lon"].values
    if vals.shape == (n_steps, n):
        vals = vals.T
    np.testing.assert_array_equal(vals.shape, (n, n_steps))
    np.testing.assert_allclose(vals, good, rtol=1e-6)
