"""Landmask reader from arbitrary polygon shapefiles.

Counterpart of the reference's ``reader_shape`` (reference:
opendrift/readers/reader_shape.py:1-180, GDAL/cartopy-based): polygons are
parsed with the bundled from-scratch .shp reader, rasterised once onto a
regular lon/lat grid, and sampled on device with the nearest-neighbour
kernel — point-in-polygon never runs inside the step.
"""

import logging

import numpy as np
import jax.numpy as jnp

from .base import ContinuousReader
from ..utils.shapefile import shapefile_polygons, rasterize_polygons

logger = logging.getLogger(__name__)


class ShapeReader(ContinuousReader):
    """land_binary_mask = 1 inside the polygons of a shapefile."""

    variables = ["land_binary_mask"]

    def __init__(self, shapefile, resolution_deg=0.001, invert=False,
                 name=None):
        polys = shapefile_polygons(shapefile)
        if not polys:
            raise ValueError(f"No polygons in {shapefile}")
        allpts = np.vstack(polys)
        pad = 10 * resolution_deg
        self._lon0 = allpts[:, 0].min() - pad
        self._lat0 = allpts[:, 1].min() - pad
        lon1 = allpts[:, 0].max() + pad
        lat1 = allpts[:, 1].max() + pad
        self._dlon = self._dlat = resolution_deg
        nx = min(int((lon1 - self._lon0) / resolution_deg) + 1, 20000)
        ny = min(int((lat1 - self._lat0) / resolution_deg) + 1, 20000)
        lons = self._lon0 + np.arange(nx) * resolution_deg
        lats = self._lat0 + np.arange(ny) * resolution_deg
        mask = rasterize_polygons(polys, lons, lats)
        if invert:
            mask = ~mask
        self._mask = mask.astype(np.float32)
        self._polys = polys
        super().__init__()
        self.name = name or f"shape_landmask_{shapefile}"
        logger.info("Rasterised %d polygons to %dx%d grid (%.1f%% inside)",
                    len(polys), ny, nx, 100 * mask.mean())

    def device_state(self, window_start=None, window_end=None):
        return jnp.asarray(self._mask)

    def sample(self, dev_state, varnames, t, lon, lat, z):
        xi = jnp.clip(jnp.round((lon - self._lon0) / self._dlon)
                      .astype(jnp.int32), 0, self._mask.shape[1] - 1)
        yi = jnp.clip(jnp.round((lat - self._lat0) / self._dlat)
                      .astype(jnp.int32), 0, self._mask.shape[0] - 1)
        vals = dev_state[yi, xi]
        covers = ((lon >= self._lon0) & (lat >= self._lat0)
                  & (xi < self._mask.shape[1] - 1)
                  & (yi < self._mask.shape[0] - 1))
        return {"land_binary_mask": vals}, covers

    def contains(self, lon, lat):
        """Host-side point-in-mask check (seeding diagnostics)."""
        xi = np.clip(np.round((np.asarray(lon) - self._lon0) / self._dlon
                              ).astype(int), 0, self._mask.shape[1] - 1)
        yi = np.clip(np.round((np.asarray(lat) - self._lat0) / self._dlat
                              ).astype(int), 0, self._mask.shape[0] - 1)
        return self._mask[yi, xi] > 0.5
