"""Global coastline landmask.

Counterpart of the reference's ``reader_global_landmask`` (reference:
opendrift/readers/reader_global_landmask.py:201-260), which samples the
GSHHG polygons through the Rust roaring-landmask package.  This build
has no global coastline dataset (zero-egress environment); coverage
comes from, in priority order:

1. a GSHHG/Natural-Earth-style polygon shapefile supplied by the
   deployment (``shapefile=`` argument or ``OPENDRIFT_LANDMASK_SHP``),
   rasterised by :class:`ShapeReader`;
2. the bundled coarse raster ``opendrift_tpu/data/coastline_mask.npz``
   (built by tools/build_landmask.py from the redistributable forcing
   subsets; covers the Nordic/Barents/Arctic test domains at 0.08 deg);
3. landmasks derived from gridded ocean readers' own grids
   (fields/netcdf.py, fields/roms.py) — always available with real
   forcing.

Unlike round 1, positions outside the raster's extent are reported as
NOT covered, so a stranding run without any usable mask fails loudly
(models/base.py) instead of silently assuming all-ocean.
"""

import logging
import os

import numpy as np
import jax.numpy as jnp

from .base import ContinuousReader
from .shape import ShapeReader

logger = logging.getLogger(__name__)

BUNDLED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "coastline_mask.npz")


class GlobalLandmask(ContinuousReader):
    """Rasterised landmask from a shapefile or the bundled raster."""

    variables = ["land_binary_mask"]

    def __new__(cls, shapefile=None, resolution_deg=0.01):
        shapefile = shapefile or os.environ.get("OPENDRIFT_LANDMASK_SHP")
        if shapefile is not None:
            if not os.path.exists(shapefile):
                raise FileNotFoundError(shapefile)
            return ShapeReader(shapefile, resolution_deg=resolution_deg,
                               name="global_landmask")
        return super().__new__(cls)

    def __init__(self, shapefile=None, resolution_deg=0.01):
        if not os.path.exists(BUNDLED):
            raise FileNotFoundError(
                "No coastline dataset: neither OPENDRIFT_LANDMASK_SHP "
                "nor the bundled raster (tools/build_landmask.py) is "
                "available")
        d = np.load(BUNDLED)
        shape = tuple(d["shape"])
        self._mask = np.unpackbits(
            d["land"], axis=1)[:, :shape[1]].astype(np.float32)
        self._covered = np.unpackbits(
            d["covered"], axis=1)[:, :shape[1]].astype(bool)
        self._lon0 = float(d["lon0"])
        self._lat0 = float(d["lat0"])
        self._dlon = float(d["dlon"])
        self._dlat = float(d["dlat"])
        super().__init__()
        self.name = "global_landmask"
        logger.info(
            "Bundled coastline raster: %dx%d at %.2f deg, lon >= %.2f, "
            "lat >= %.2f (coverage limited to the bundled domains)",
            *self._mask.shape, self._dlon, self._lon0, self._lat0)

    def _indices(self, xp, lon, lat):
        xi = xp.clip(xp.round((lon - self._lon0) / self._dlon
                              ).astype(xp.int32), 0,
                     self._mask.shape[1] - 1)
        yi = xp.clip(xp.round((lat - self._lat0) / self._dlat
                              ).astype(xp.int32), 0,
                     self._mask.shape[0] - 1)
        inside = ((lon >= self._lon0) & (lat >= self._lat0)
                  & (xi < self._mask.shape[1] - 1)
                  & (yi < self._mask.shape[0] - 1))
        return xi, yi, inside

    def device_state(self, window_start=None, window_end=None):
        return {"mask": jnp.asarray(self._mask),
                "covered": jnp.asarray(self._covered)}

    def sample(self, dev_state, varnames, t, lon, lat, z):
        xi, yi, inside = self._indices(jnp, lon, lat)
        covers = inside & dev_state["covered"][yi, xi]
        return {"land_binary_mask": dev_state["mask"][yi, xi]}, covers

    def covers_positions(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        xi, yi, inside = self._indices(np, lon, lat)
        return inside & self._covered[yi, xi]

    def contains(self, lon, lat):
        """Host-side point-on-land check (seeding diagnostics)."""
        xi, yi, inside = self._indices(np, np.asarray(lon, np.float64),
                                       np.asarray(lat, np.float64))
        return inside & (self._mask[yi, xi] > 0.5)
