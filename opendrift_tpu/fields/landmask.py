"""Global coastline landmask.

Counterpart of the reference's ``reader_global_landmask`` (reference:
opendrift/readers/reader_global_landmask.py:201-260), which samples the
GSHHG polygons through the Rust roaring-landmask package.  This build has
no bundled global coastline dataset (zero-egress environment); the class
rasterises any GSHHG/Natural-Earth-style polygon shapefile the deployment
provides (``OPENDRIFT_LANDMASK_SHP`` env var or explicit path) onto a
device raster sampled with the nearest kernel.  Gridded ocean readers
additionally derive landmasks from their own grids
(fields/netcdf.py, fields/roms.py), which covers their domains without
external data.
"""

import logging
import os

from .shape import ShapeReader

logger = logging.getLogger(__name__)


class GlobalLandmask(ShapeReader):
    """Rasterised global landmask from a user-provided polygon shapefile."""

    def __init__(self, shapefile=None, resolution_deg=0.01):
        shapefile = shapefile or os.environ.get("OPENDRIFT_LANDMASK_SHP")
        if shapefile is None or not os.path.exists(shapefile):
            raise FileNotFoundError(
                "No global coastline dataset available: set "
                "OPENDRIFT_LANDMASK_SHP to a GSHHG/Natural-Earth land "
                "polygon shapefile, or rely on the landmasks derived from "
                "gridded ocean readers")
        super().__init__(shapefile, resolution_deg=resolution_deg,
                         name="global_landmask")
