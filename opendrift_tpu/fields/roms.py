"""ROMS native reader: curvilinear C-grid, terrain-following sigma levels.

TPU-native counterpart of the reference's ROMS reader + roppy vertical
machinery (reference: opendrift/readers/reader_ROMS_native.py:1-795,
opendrift/readers/roppy/depth.py:1-461).  Architectural difference: the
reference interpolates directly on the curvilinear grid with scattered
interpolators per fetch; here each frame is regridded ONCE at load time —
curvilinear -> regular lon/lat via precomputed Delaunay barycentric
weights, and sigma -> fixed z levels via the Vtransform/Vstretching depth
formula — so the device-side hot path is the same fused regular-grid
kernel as every other structured reader.  C-grid u/v are unstaggered to
rho points and rotated by the grid ``angle`` to true east/north at load.
"""

import logging

import numpy as np

from .grid import StructuredGridReader
from ..utils import ncio

logger = logging.getLogger(__name__)

ROMS_VARIABLE_MAP = {
    "u": "x_sea_water_velocity",
    "v": "y_sea_water_velocity",
    "temp": "sea_water_temperature",
    "salt": "sea_water_salinity",
    "zeta": "sea_surface_height",
    "uice": "sea_ice_x_velocity",
    "vice": "sea_ice_y_velocity",
    "aice": "sea_ice_area_fraction",
    "hice": "sea_ice_thickness",
    "w": "upward_sea_water_velocity",
    "AKs": "ocean_vertical_diffusivity",
    "Hsbl": "ocean_mixed_layer_thickness",
}

DEFAULT_DEPTHS = np.array(
    [0.0, 2.0, 5.0, 10.0, 20.0, 30.0, 50.0, 75.0, 100.0, 150.0, 200.0,
     300.0, 500.0, 1000.0, 2000.0, 3000.0], dtype=np.float32)


def s_stretch(N, theta_s, theta_b, stagger="rho", vstretching=1):
    """ROMS s-level stretching curves C(s), Vstretching 1-5
    (roppy.s_stretch equivalent, reference roppy/depth.py:383-455;
    formulas from the ROMS vertical-coordinate documentation).  Used
    when a file carries theta_s/theta_b but no Cs_r variable."""
    if stagger == "rho":
        K = np.arange(0.5, N)
    elif stagger == "w":
        K = np.arange(N + 1, dtype=np.float64)
    else:
        raise ValueError("stagger must be 'rho' or 'w'")
    S = -1.0 + K / N
    if vstretching == 1:
        cff1 = 1.0 / np.sinh(theta_s)
        cff2 = 0.5 / np.tanh(0.5 * theta_s)
        return ((1.0 - theta_b) * cff1 * np.sinh(theta_s * S)
                + theta_b * (cff2 * np.tanh(theta_s * (S + 0.5)) - 0.5))
    if vstretching == 2:
        a = b = 1.0
        Csur = (1 - np.cosh(theta_s * S)) / (np.cosh(theta_s) - 1)
        Cbot = np.sinh(theta_b * (S + 1)) / np.sinh(theta_b) - 1
        mu = (S + 1) ** a * (1 + (a / b) * (1 - (S + 1) ** b))
        return mu * Csur + (1 - mu) * Cbot
    if vstretching == 3:
        g = 3.0
        Csur = -np.log(np.cosh(g * (-S) ** theta_s)) / np.log(np.cosh(g))
        Cbot = (np.log(np.cosh(g * (S + 1) ** theta_b))
                / np.log(np.cosh(g)) - 1)
        mu = 0.5 * (1 - np.tanh(g * (S + 0.5)))
        return mu * Csur + (1 - mu) * Cbot
    if vstretching in (4, 5):
        if vstretching == 5:
            S1 = (K * K - 2 * K * N + K + N * N - N) / (N * N - N)
            S2 = (K * K - K * N) / (1.0 - N)
            S = -S1 - 0.01 * S2
        C = (1 - np.cosh(theta_s * S)) / (np.cosh(theta_s) - 1)
        return (np.exp(theta_b * C) - 1) / (1 - np.exp(-theta_b))
    raise ValueError(f"Unknown Vstretching {vstretching}")


def zslice_columns(data_sigma, z, depths):
    """(S, ...) sigma-level columns -> (L, ...) values at fixed target
    depths (positive down), linear in z with end-clamping — the
    vectorised roppy.multi_zslice (reference roppy/depth.py:213-285)."""
    S = z.shape[0]
    out = np.empty((len(depths),) + z.shape[1:], dtype=np.float32)
    for li, d in enumerate(depths):
        zt = -float(d)
        k = np.clip(np.sum(z < zt, axis=0), 1, S - 1)
        z_lo = np.take_along_axis(z, (k - 1)[None], 0)[0]
        z_hi = np.take_along_axis(z, k[None], 0)[0]
        v_lo = np.take_along_axis(data_sigma, (k - 1)[None], 0)[0]
        v_hi = np.take_along_axis(data_sigma, k[None], 0)[0]
        denom = np.where(z_hi != z_lo, z_hi - z_lo, 1.0)
        w = np.clip((zt - z_lo) / denom, 0.0, 1.0)
        out[li] = v_lo * (1.0 - w) + w * v_hi
    return out


def sdepth(h, zeta, hc, C, s, vtransform=2):
    """Depth of sigma levels (roppy.sdepth equivalent,
    reference roppy/depth.py:24-112).  Returns z (S, ...) negative down."""
    h = np.asarray(h)[None, ...]
    zeta_b = np.asarray(zeta)[None, ...]
    C = np.asarray(C).reshape((-1,) + (1,) * (h.ndim - 1))
    s = np.asarray(s).reshape(C.shape)
    if vtransform == 1:
        z0 = hc * s + (h - hc) * C
        return z0 + zeta_b * (1.0 + z0 / h)
    # Vtransform 2 (the modern default)
    z0 = (hc * s + h * C) / (hc + h)
    return zeta_b + (zeta_b + h) * z0


class ROMSReader(StructuredGridReader):
    """Reader for ROMS output (native curvilinear sigma grid)."""

    def __init__(self, filename, gridfile=None, name=None,
                 target_depths=None, refinement=1.0):
        if isinstance(filename, (list, tuple)):
            self._files = [ncio.open_dataset(f) for f in filename]
            self.name = name or str(filename[0])
        else:
            self._files = [ncio.open_dataset(filename)]
            self.name = name or str(filename)
        ds = self._files[0]
        grid_ds = ncio.open_dataset(gridfile) if gridfile else ds
        self._grid_ds = grid_ds

        def gvar(n, required=True):
            src = grid_ds if n in grid_ds.variables else ds
            if n not in src.variables:
                if required:
                    raise ValueError(f"{self.name}: missing ROMS grid "
                                     f"variable '{n}'")
                return None
            v = src.variables[n]
            return ncio.cf_unpack(v, v[:])

        lon_rho = gvar("lon_rho").astype(np.float64)
        lat_rho = gvar("lat_rho").astype(np.float64)
        self._eta, self._xi = lon_rho.shape
        h = gvar("h")
        mask_rho = gvar("mask_rho", required=False)
        if mask_rho is None:
            mask_rho = np.ones_like(h)
        angle = gvar("angle", required=False)
        if angle is None:
            angle = np.zeros_like(h)
        self._h = np.nan_to_num(h, nan=0.0)
        self._mask = np.nan_to_num(mask_rho, nan=0.0) > 0.5
        self._angle = np.nan_to_num(angle, nan=0.0)
        self._lon_rho = lon_rho
        self._lat_rho = lat_rho

        # ---- sigma machinery
        self._s_rho = gvar("s_rho", required=False)
        # CROCO names the stretching curve Cs_rho instead of Cs_r
        self._Cs_r = gvar("Cs_r", required=False)
        if self._Cs_r is None:
            self._Cs_r = gvar("Cs_rho", required=False)
        if self._Cs_r is None and self._s_rho is not None:
            # no stored stretching curve: compute from theta_s/theta_b
            # like reference reader_ROMS_native via roppy.s_stretch
            def scalar(n):
                v = gvar(n, required=False)
                if v is not None:
                    return float(np.asarray(v).ravel()[0])
                a = ds.attrs.get(n)
                return float(a) if a is not None else None

            th_s = scalar("theta_s")
            th_b = scalar("theta_b")
            vstr = scalar("Vstretching")
            if th_s is not None:
                self._Cs_r = s_stretch(
                    len(self._s_rho), th_s, th_b or 0.0,
                    vstretching=int(vstr) if vstr else 1)
        hc = gvar("hc", required=False)
        self._hc = float(np.ravel(hc)[0]) if hc is not None else 0.0
        vt = gvar("Vtransform", required=False)
        if vt is not None:
            vt = np.ravel(vt)[0]
        self._vtransform = int(vt) if vt is not None and np.isfinite(vt) \
            else 2
        self._n_sigma = len(self._s_rho) if self._s_rho is not None else 0

        # ---- time axis (ROMS: ocean_time; CROCO: time/scrum_time)
        tname = next(t for t in ("ocean_time", "time", "scrum_time")
                     if t in ds.variables)
        self.times = []
        self._file_of_frame = []
        self._index_in_file = []
        for fi, f in enumerate(self._files):
            tv = f.variables[tname]
            for i, t in enumerate(ncio.parse_cf_time(tv.attrs["units"],
                                                     tv[:])):
                self.times.append(t)
                self._file_of_frame.append(fi)
                self._index_in_file.append(i)
        order = np.argsort([t.timestamp() for t in self.times])
        self.times = [self.times[i] for i in order]
        self._file_of_frame = [self._file_of_frame[i] for i in order]
        self._index_in_file = [self._index_in_file[i] for i in order]

        # ---- variable mapping
        self._sources = {}
        self._var_has_z = {}
        self.variables = []
        for vname, std in ROMS_VARIABLE_MAP.items():
            if vname not in ds.variables:
                continue
            dims = ds.variables[vname].dimensions
            has_z = any(d in ("s_rho", "s_w") for d in dims)
            self._sources[std] = (vname, has_z)
            self._var_has_z[std] = has_z
            self.variables.append(std)
        self.variables += ["land_binary_mask",
                           "sea_floor_depth_below_sea_level"]
        self._var_has_z["land_binary_mask"] = False
        self._var_has_z["sea_floor_depth_below_sea_level"] = False

        # ---- target regular lon/lat grid
        ocean = self._mask
        lo = lon_rho[ocean] if ocean.any() else lon_rho.ravel()
        la = lat_rho[ocean] if ocean.any() else lat_rho.ravel()
        # mean native spacing in degrees
        dlon = np.median(np.abs(np.diff(lon_rho, axis=1)))
        dlat = np.median(np.abs(np.diff(lat_rho, axis=0)))
        step_lon = max(dlon, 1e-4) / refinement
        step_lat = max(dlat, 1e-4) / refinement
        nx = int((lon_rho.max() - lon_rho.min()) / step_lon) + 2
        ny = int((lat_rho.max() - lat_rho.min()) / step_lat) + 2
        nx = min(max(nx, 4), 2048)
        ny = min(max(ny, 4), 2048)
        self.x = np.linspace(lon_rho.min(), lon_rho.max(), nx)
        self.y = np.linspace(lat_rho.min(), lat_rho.max(), ny)
        self.proj4 = "+proj=latlong"

        # ---- precompute barycentric regrid weights (once)
        from scipy.spatial import Delaunay
        pts = np.column_stack([lon_rho.ravel(), lat_rho.ravel()])
        self._tri = Delaunay(pts)
        TX, TY = np.meshgrid(self.x, self.y)
        targets = np.column_stack([TX.ravel(), TY.ravel()])
        simplex = self._tri.find_simplex(targets)
        self._outside = simplex < 0
        simplex_c = np.where(self._outside, 0, simplex)
        trans = self._tri.transform[simplex_c]
        bary = np.einsum("nij,nj->ni", trans[:, :2, :],
                         targets - trans[:, 2, :])
        self._bary_w = np.concatenate(
            [bary, 1.0 - bary.sum(axis=1, keepdims=True)], axis=1)
        self._bary_idx = self._tri.simplices[simplex_c]

        # depth levels for the regridded blocks
        if target_depths is None:
            hmax = float(np.nanmax(self._h))
            target_depths = DEFAULT_DEPTHS[DEFAULT_DEPTHS <= max(hmax, 5.0)]
        self.depths = np.asarray(target_depths, dtype=np.float32)

        # static regridded fields
        self._static_cache = {}
        super().__init__()

    # ----------------------------------------------------------- regrid --
    def _regrid2d(self, field_rho):
        """Curvilinear (eta, xi) -> regular (ny, nx) via the precomputed
        barycentric weights; outside the hull -> NaN."""
        flat = field_rho.ravel()
        vals = (flat[self._bary_idx] * self._bary_w).sum(axis=1)
        vals[self._outside] = np.nan
        return vals.reshape(len(self.y), len(self.x)).astype(np.float32)

    def _sigma_to_z(self, data_sigma, zeta):
        """(S, eta, xi) sigma-level data -> (L, eta, xi) at fixed target
        depths (vectorised column interpolation; roppy.zslice equivalent,
        reference roppy/depth.py:115-199)."""
        z = sdepth(self._h, zeta, self._hc, self._Cs_r, self._s_rho,
                   self._vtransform)          # (S, eta, xi), ascending
        return zslice_columns(data_sigma, z, self.depths)

    def _unstagger(self, data, kind):
        """Average u/v-point data to rho points when staggered; subset
        files often store them already on matching shapes."""
        if data.shape[-2:] == (self._eta, self._xi):
            return data
        out = np.full(data.shape[:-2] + (self._eta, self._xi), np.nan,
                      dtype=np.float32)
        if kind == "u":  # (eta, xi-1)
            out[..., :, 1:-1] = 0.5 * (data[..., :, :-1]
                                       + data[..., :, 1:])
            out[..., :, 0] = data[..., :, 0]
            out[..., :, -1] = data[..., :, -1]
        else:            # (eta-1, xi)
            out[..., 1:-1, :] = 0.5 * (data[..., :-1, :]
                                       + data[..., 1:, :])
            out[..., 0, :] = data[..., 0, :]
            out[..., -1, :] = data[..., -1, :]
        return out

    def _read_pair_rotated(self, uname, vname, ti):
        """u/v at rho points rotated to east/north (cached per frame)."""
        key = ("uv_eastnorth", uname, ti)
        if key in self._static_cache:
            return self._static_cache[key]
        fi = self._file_of_frame[ti]
        ii = self._index_in_file[ti]
        ds = self._files[fi]
        uv = []
        for nm, kind in ((uname, "u"), (vname, "v")):
            var = ds.variables[nm]
            raw = var[ii]
            data = ncio.cf_unpack(var, raw)
            uv.append(self._unstagger(data, kind))
        u, v = uv
        ca, sa = np.cos(self._angle), np.sin(self._angle)
        ue = u * ca - v * sa
        vn = u * sa + v * ca
        self._static_cache = {k: val for k, val in
                              self._static_cache.items()
                              if k[0] != "uv_eastnorth" or k[2] == ti}
        self._static_cache[key] = (ue, vn)
        return ue, vn

    def _zeta(self, ti):
        fi = self._file_of_frame[ti]
        ii = self._index_in_file[ti]
        ds = self._files[fi]
        if "zeta" in ds.variables:
            var = ds.variables["zeta"]
            return np.nan_to_num(ncio.cf_unpack(var, var[ii]), nan=0.0)
        return np.zeros_like(self._h)

    # ------------------------------------------------------------ frames -
    def _read_frame(self, std, ti, zslice, yslice, xslice):
        if std == "land_binary_mask":
            if "land" not in self._static_cache:
                land = self._regrid2d((~self._mask).astype(np.float32))
                land = np.where(np.isfinite(land),
                                (land > 0.4).astype(np.float32), 1.0)
                self._static_cache["land"] = land
            return self._static_cache["land"][yslice, xslice]
        if std == "sea_floor_depth_below_sea_level":
            if "h" not in self._static_cache:
                self._static_cache["h"] = self._regrid2d(self._h)
            return self._static_cache["h"][yslice, xslice]

        vname, has_z = self._sources[std]
        pair = {"x_sea_water_velocity": ("u", "v", 0),
                "y_sea_water_velocity": ("u", "v", 1),
                "sea_ice_x_velocity": ("uice", "vice", 0),
                "sea_ice_y_velocity": ("uice", "vice", 1)}
        if std in pair:
            un, vn_, comp = pair[std]
            data = self._read_pair_rotated(un, vn_, ti)[comp]
        else:
            fi = self._file_of_frame[ti]
            ii = self._index_in_file[ti]
            var = self._files[fi].variables[vname]
            data = ncio.cf_unpack(var, var[ii])
        # mask land columns before regridding
        data = np.where(self._mask[None] if data.ndim == 3 else self._mask,
                        data, np.nan)
        if has_z and data.ndim == 3:
            data = self._sigma_to_z(data, self._zeta(ti))
            out = np.stack([self._regrid2d(data[li])
                            for li in range(data.shape[0])])
            return out[:, yslice, xslice]
        return self._regrid2d(data)[yslice, xslice]

    def covers_positions(self, lon, lat):
        ok = super().covers_positions(lon, lat)
        return ok
