"""Unstructured-mesh readers: generic nodes, Telemac Selafin, FVCOM/UGRID.

TPU-first counterpart of the reference's unstructured framework
(reference: opendrift/readers/basereader/unstructured.py:10-186,
reader_telemac_selafin.py, reader_netCDF_CF_unstructured.py,
reader_FVCOM_xarray.py, unstructured/shyfem.py): instead of per-fetch
KD-tree nearest-node lookups, each frame is regridded once at load time
through precomputed Delaunay barycentric weights (fields/regrid.py) onto
a regular lon/lat grid, after which the device-side sampling is the same
packed-row kernel as every structured reader.
"""

import logging
from datetime import datetime, timedelta

import numpy as np

from .grid import StructuredGridReader
from .regrid import DelaunayRegridder
from ..utils import ncio

logger = logging.getLogger(__name__)


class UnstructuredReader(StructuredGridReader):
    """Base: subclasses provide node coordinates and per-frame node
    values; this class owns the regridding and the structured fast path.

    Subclass contract (before ``super().__init__()``):
      self._node_lon, self._node_lat : (n_nodes,)
      self.times : list of datetimes
      self.variables, self._var_has_z (all False in this base)
    and implement ``_node_values(std, time_index) -> (n_nodes,)``.
    """

    def __init__(self, resolution_deg=None):
        self._regrid = DelaunayRegridder(self._node_lon, self._node_lat,
                                         resolution_deg=resolution_deg)
        self.x = self._regrid.lons
        self.y = self._regrid.lats
        self.proj4 = "+proj=latlong"
        if not hasattr(self, "depths"):
            self.depths = None
        super(UnstructuredReader, self).__init__()

    def _read_frame(self, std, ti, zslice, yslice, xslice):
        if std == "land_binary_mask":
            # outside the mesh hull = land-ish; inside = ocean
            land = np.where(self._regrid.outside.reshape(
                self._regrid.shape), 1.0, 0.0).astype(np.float32)
            return land[yslice, xslice]
        vals = self._node_values(std, ti)
        return self._regrid(vals)[yslice, xslice]


class TelemacReader(UnstructuredReader):
    """Telemac Selafin results (own binary parser, utils/selafin.py).

    Telemac files carry no CRS; pass the model's ``proj4``.  For 3D
    results (NPLAN vertical planes) the surface plane is served; full
    sigma-plane support requires the ELEVATION Z variable."""

    VARIABLE_MAP = {
        "VELOCITY U": "x_sea_water_velocity",
        "VELOCITY V": "y_sea_water_velocity",
        "FREE SURFACE": "sea_surface_height",
        "WATER DEPTH": "sea_floor_depth_below_sea_level",
        "TEMPERATURE": "sea_water_temperature",
        "SALINITY": "sea_water_salinity",
    }

    def __init__(self, filename, proj4, start_time=None,
                 resolution_deg=None, name=None):
        from ..utils.selafin import SelafinFile
        from ..utils import crs as crslib
        self._slf = SelafinFile(filename)
        self.name = name or filename
        nplan = max(self._slf.iparam[6], 1)
        self._nplan = nplan
        self._npoin2d = self._slf.n_nodes // nplan
        # surface plane is the last (Telemac planes are bottom-up)
        surf = slice((nplan - 1) * self._npoin2d, nplan * self._npoin2d)
        self._surf = surf
        mesh_crs = crslib.from_proj4(proj4)
        lon, lat = mesh_crs.inv(np, self._slf.x[surf], self._slf.y[surf])
        self._node_lon = lon
        self._node_lat = lat
        if start_time is None:
            if self._slf.date is not None:
                d = self._slf.date
                start_time = datetime(*[max(v, 1) if i < 3 else v
                                        for i, v in enumerate(d[:6])])
            else:
                start_time = datetime(1970, 1, 1)
        self.times = [start_time + timedelta(seconds=s)
                      for s in self._slf.times_seconds]
        self._name_index = {}
        self.variables = []
        for i, raw in enumerate(self._slf.variable_names):
            std = self.VARIABLE_MAP.get(raw)
            if std is not None:
                self._name_index[std] = i
                self.variables.append(std)
        self.variables.append("land_binary_mask")
        self._var_has_z = {v: False for v in self.variables}
        super().__init__(resolution_deg=resolution_deg)

    def _node_values(self, std, ti):
        vals = self._slf.read_variable(self._name_index[std], ti)
        return vals[self._surf]


class SCHISMReader(UnstructuredReader):
    """SCHISM native output (reference: opendrift/readers/
    reader_schism_native.py:18-300).  Node coordinates are projected
    (``SCHISM_hgrid_node_x/y``) — pass the model ``proj4``.  Supports
    depth-averaged ``dahv`` and, with ``use_3d=True``, ``hvel`` columns
    interpolated from the time-varying ``zcor`` levels onto fixed target
    depths at load time."""

    SCALAR_VARS = {
        "elev": "sea_surface_height",
        "depth": "sea_floor_depth_below_sea_level",
        "salt": "sea_water_salinity",
        "temp": "sea_water_temperature",
    }

    def __init__(self, filename, proj4, use_3d=False, target_depths=None,
                 resolution_deg=None, name=None):
        from ..utils import crs as crslib
        self._ds = ncio.open_dataset(filename)
        self.name = name or filename
        ds = self._ds
        x = np.asarray(ds.variables["SCHISM_hgrid_node_x"][:],
                       dtype=np.float64).ravel()
        y = np.asarray(ds.variables["SCHISM_hgrid_node_y"][:],
                       dtype=np.float64).ravel()
        # coordinate arrays may be tiled (time, node) in some files
        mesh_crs = crslib.from_proj4(proj4)
        self._node_lon, self._node_lat = mesh_crs.inv(np, x, y)
        tv = ds.variables["time"]
        self.times = list(ncio.parse_cf_time(
            tv.attrs.get("units", "seconds since 1970-01-01"), tv[:]))
        self._use_3d = use_3d and "hvel" in ds.variables
        self.variables = []
        self._var_has_z = {}
        for raw, std in self.SCALAR_VARS.items():
            if raw in ds.variables:
                self.variables.append(std)
                self._var_has_z[std] = False
        if self._use_3d or "dahv" in ds.variables:
            for std in ("x_sea_water_velocity", "y_sea_water_velocity"):
                self.variables.append(std)
                self._var_has_z[std] = self._use_3d
        self.variables.append("land_binary_mask")
        self._var_has_z["land_binary_mask"] = False
        if self._use_3d:
            if target_depths is None:
                hmax = float(np.nanmax(np.asarray(
                    ds.variables["depth"][:])))
                from .roms import DEFAULT_DEPTHS
                target_depths = DEFAULT_DEPTHS[
                    DEFAULT_DEPTHS <= max(hmax, 5.0)]
            self.depths = np.asarray(target_depths, dtype=np.float32)
        else:
            self.depths = None
        super().__init__(resolution_deg=resolution_deg)

    def _velocity_nodes(self, comp, ti):
        """(n_nodes,) for 2D dahv, or (L, n_nodes) from hvel columns."""
        ds = self._ds
        if not self._use_3d:
            v = ds.variables["dahv"]
            return ncio.cf_unpack(v, v[ti])[..., comp]
        hvel = ncio.cf_unpack(ds.variables["hvel"],
                              ds.variables["hvel"][ti])  # (node, lev, 2)
        zcor = ncio.cf_unpack(ds.variables["zcor"],
                              ds.variables["zcor"][ti])  # (node, lev)
        data = hvel[..., comp]
        out = np.empty((len(self.depths), data.shape[0]), np.float32)
        S = zcor.shape[1]
        for li, d in enumerate(self.depths):
            zt = -float(d)
            k = np.clip(np.sum(zcor < zt, axis=1), 1, S - 1)
            z_lo = np.take_along_axis(zcor, (k - 1)[:, None], 1)[:, 0]
            z_hi = np.take_along_axis(zcor, k[:, None], 1)[:, 0]
            v_lo = np.take_along_axis(data, (k - 1)[:, None], 1)[:, 0]
            v_hi = np.take_along_axis(data, k[:, None], 1)[:, 0]
            denom = np.where(z_hi != z_lo, z_hi - z_lo, 1.0)
            w = np.clip((zt - z_lo) / denom, 0.0, 1.0)
            out[li] = v_lo * (1.0 - w) + w * v_hi
        return out

    def _read_frame(self, std, ti, zslice, yslice, xslice):
        if std == "land_binary_mask":
            return super()._read_frame(std, ti, zslice, yslice, xslice)
        comp = {"x_sea_water_velocity": 0, "y_sea_water_velocity": 1}
        if std in comp:
            vals = self._velocity_nodes(comp[std], ti)
            out = self._regrid(vals)
            if out.ndim == 3:
                return out[zslice, yslice, xslice]
            return out[yslice, xslice]
        raw = next(k for k, v in self.SCALAR_VARS.items() if v == std)
        var = self._ds.variables[raw]
        if "time" in var.dimensions:
            vals = ncio.cf_unpack(var, var[ti])
        else:
            vals = ncio.cf_unpack(var, var[:])
        return self._regrid(vals.ravel())[yslice, xslice]


class SHYFEMReader(UnstructuredReader):
    """SHYFEM unstructured output (reference: opendrift/readers/
    unstructured/shyfem.py:20-240): geographic node coordinates
    (``longitude``/``latitude``), fixed ``level`` depths (positive down,
    layer bottoms), variables identified by their ``standard_name``."""

    NAME_MAP = {
        "sea_floor_depth_below_sea_surface":
            "sea_floor_depth_below_sea_level",
        "eastward_sea_water_velocity": "x_sea_water_velocity",
        "northward_sea_water_velocity": "y_sea_water_velocity",
    }

    def __init__(self, filename, resolution_deg=None, name=None):
        self._ds = ncio.open_dataset(filename)
        self.name = name or filename
        ds = self._ds
        self._node_lon = np.asarray(ds.variables["longitude"][:],
                                    dtype=np.float64).ravel()
        self._node_lat = np.asarray(ds.variables["latitude"][:],
                                    dtype=np.float64).ravel()
        tv = ds.variables["time"]
        self.times = list(ncio.parse_cf_time(
            tv.attrs.get("units", "seconds since 1970-01-01"), tv[:]))
        # layer-bottom depths -> layer-centre depths (reference
        # shyfem.py:97-102)
        lv = np.asarray(ds.variables["level"][:], dtype=np.float64).ravel()
        centres = lv - np.diff(np.concatenate([[0.0], lv])) / 2.0
        self._levels = centres.astype(np.float32)
        self._sources = {}
        self.variables = []
        self._var_has_z = {}
        for vn, var in ds.variables.items():
            if vn in ("time", "longitude", "latitude", "level"):
                continue
            std = var.attrs.get("standard_name", vn)
            std = self.NAME_MAP.get(std, std)
            if std in self._sources:
                continue
            has_z = "level" in var.dimensions
            self._sources[std] = (vn, has_z)
            self._var_has_z[std] = has_z
            self.variables.append(std)
        self.variables.append("land_binary_mask")
        self._var_has_z["land_binary_mask"] = False
        self.depths = self._levels if any(
            h for _, h in self._sources.values()) else None
        super().__init__(resolution_deg=resolution_deg)

    def _read_frame(self, std, ti, zslice, yslice, xslice):
        if std == "land_binary_mask":
            return super()._read_frame(std, ti, zslice, yslice, xslice)
        vn, has_z = self._sources[std]
        var = self._ds.variables[vn]
        vals = ncio.cf_unpack(
            var, var[ti] if "time" in var.dimensions else var[:])
        if has_z:  # (level, node)
            out = self._regrid(vals)
            return out[zslice, yslice, xslice]
        return self._regrid(vals.ravel())[yslice, xslice]


class FVCOMReader(UnstructuredReader):
    """FVCOM / CF-UGRID triangular-mesh NetCDF.

    Node variables (zeta, temp, salinity) are regridded from nodes;
    cell-centre variables (u, v, ua, va) from element centroids."""

    NODE_VARS = {
        "zeta": "sea_surface_height",
        "temp": "sea_water_temperature",
        "salinity": "sea_water_salinity",
        "h": "sea_floor_depth_below_sea_level",
    }
    CELL_VARS = {
        "u": "x_sea_water_velocity",
        "v": "y_sea_water_velocity",
        "ua": "x_sea_water_velocity",
        "va": "y_sea_water_velocity",
    }

    def __init__(self, filename, resolution_deg=None, name=None):
        self._ds = ncio.open_dataset(filename)
        self.name = name or filename
        ds = self._ds

        def get(n):
            return np.asarray(ds.variables[n][:], dtype=np.float64)
        self._node_lon = get("lon")
        self._node_lat = get("lat")
        if np.all(self._node_lon == 0):  # some files only carry x/y
            self._node_lon = get("x")
            self._node_lat = get("y")
        # cell centres (from latc/lonc, else centroids via nv)
        if "lonc" in ds.variables:
            self._cell_lon = get("lonc")
            self._cell_lat = get("latc")
        else:
            nv = np.asarray(ds.variables["nv"][:], dtype=int)
            if nv.shape[0] == 3:
                nv = nv.T
            nv = nv - nv.min()
            self._cell_lon = self._node_lon[nv].mean(axis=1)
            self._cell_lat = self._node_lat[nv].mean(axis=1)

        # time axis
        tname = "time" if "time" in ds.variables else "Times"
        tv = ds.variables[tname]
        self.times = list(ncio.parse_cf_time(
            tv.attrs.get("units", "days since 1858-11-17 00:00:00"),
            tv[:]))

        self._sources = {}
        self.variables = []
        for raw, std in {**self.NODE_VARS, **self.CELL_VARS}.items():
            if raw in ds.variables and std not in self._sources:
                on_cells = raw in self.CELL_VARS
                self._sources[std] = (raw, on_cells)
                self.variables.append(std)
        self.variables.append("land_binary_mask")
        self._var_has_z = {v: False for v in self.variables}
        super().__init__(resolution_deg=resolution_deg)
        # secondary regridder for cell-centre data
        self._cell_regrid = DelaunayRegridder(
            self._cell_lon, self._cell_lat, resolution_deg=resolution_deg)
        # re-target cell regridder onto the node grid
        if self._cell_regrid.shape != self._regrid.shape:
            self._cell_regrid = DelaunayRegridder(
                self._cell_lon, self._cell_lat,
                resolution_deg=float(self.x[1] - self.x[0]))

    def _node_values(self, std, ti):
        raise NotImplementedError  # frames read directly below

    def _read_frame(self, std, ti, zslice, yslice, xslice):
        if std == "land_binary_mask":
            return super()._read_frame(std, ti, zslice, yslice, xslice)
        raw, on_cells = self._sources[std]
        var = self._ds.variables[raw]
        dims = var.dimensions
        idx = []
        for d in dims:
            if d in ("time",):
                idx.append(ti)
            elif d in ("siglay", "siglev"):
                idx.append(0)  # surface layer
            else:
                idx.append(slice(None))
        vals = ncio.cf_unpack(var, var[tuple(idx)]).ravel()
        rg = self._cell_regrid if on_cells else self._regrid
        out = rg(np.nan_to_num(vals, nan=0.0))
        # pad/crop cell grid onto the node grid if they differ slightly
        ny, nx = self._regrid.shape
        if out.shape != (ny, nx):
            fixed = np.full((ny, nx), np.nan, dtype=np.float32)
            fy = min(ny, out.shape[0])
            fx = min(nx, out.shape[1])
            fixed[:fy, :fx] = out[:fy, :fx]
            out = fixed
        return out[yslice, xslice]
