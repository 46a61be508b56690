"""Dependency shims that let the ACTUAL reference OpenDrift package at
/root/reference run in this image (which lacks pyproj/xarray/netCDF4/
cartopy/shapely/geojson/roaring-landmask/coloredlogs).

Purpose: execute the reference's own ``OpenDriftSimulation.run()``
(reference basemodel/__init__.py:1829) end-to-end so trajectory goldens
can be captured and compared against opendrift_tpu — the BASELINE
acceptance test ("matching OpenDrift allclose after 100 steps").

Every shim implements ONLY the surface the reference's run path touches:

- ``pyproj``  -> delegates to opendrift_tpu.utils.crs / utils.geodesic
  (our from-scratch PROJ + Vincenty implementations).
- ``xarray``  -> a small Dataset/DataArray facade over numpy sufficient
  for ``self.result`` buffering (reference basemodel/__init__.py:2083-2499).
- ``roaring_landmask`` -> all-ocean mask (scenarios provide their own
  land_binary_mask or a fallback of 0).
- ``netCDF4``/``cartopy``/``shapely``/``geojson``/``copernicusmarine``/
  ``cmocean``/``coloredlogs`` -> import-time stubs (never called on the
  run path for the golden scenarios).

Run under a SUBPROCESS only (tools/ref_runner.py): installing these
mutates sys.modules globally.
"""

import json
import sys
import types

import numpy as np


# --------------------------------------------------------------------
# pyproj
# --------------------------------------------------------------------

def _build_pyproj():
    from opendrift_tpu.utils import crs as tcrs
    from opendrift_tpu.utils import geodesic as tgeo

    pyproj = types.ModuleType("pyproj")

    class _CRSInfo:
        def __init__(self, is_geographic):
            self.is_geographic = is_geographic

    class Proj:
        def __init__(self, arg, preserve_units=True):
            if isinstance(arg, Proj):
                self.srs = arg.srs
                self._impl = arg._impl
            elif isinstance(arg, dict):
                self.srs = " ".join(f"+{k}={v}" for k, v in arg.items())
                self._impl = tcrs.from_proj4(self.srs)
            else:
                self.srs = str(arg)
                self._impl = tcrs.from_proj4(self.srs)
            geographic = ("+proj=latlong" in self.srs
                          or "+proj=longlat" in self.srs
                          or "+proj=lonlat" in self.srs
                          or "+proj=latlon" in self.srs)
            self.crs = _CRSInfo(geographic)

        @property
        def proj4(self):
            return self.srs

        def definition_string(self):
            return self.srs

        def __call__(self, x, y, inverse=False):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            if inverse:
                lon, lat = self._impl.inv(np, x, y)
                return lon, lat
            return self._impl.fwd(np, x, y)

    class Geod:
        def __init__(self, ellps="WGS84", **kw):
            pass

        def fwd(self, lons, lats, az, dist, radians=False):
            lat2, lon2 = tgeo.direct_np(lats, lons, az, dist)
            # back azimuth: forward azimuth at destination + 180, cheap
            # approximation — the reference run path discards it.
            back = np.asarray(az, dtype=np.float64) + 180.0
            back = np.where(back > 180.0, back - 360.0, back)
            return lon2, lat2, back

        def inv(self, lons1, lats1, lons2, lats2, radians=False):
            az12, az21, dist = tgeo.inverse_np(lats1, lons1, lats2, lons2)
            return az12, az21, dist

    class Transformer:
        def __init__(self, p_from, p_to):
            self._from = p_from
            self._to = p_to

        @classmethod
        def from_proj(cls, p_from, p_to, always_xy=False):
            if not isinstance(p_from, Proj):
                p_from = Proj(p_from)
            if not isinstance(p_to, Proj):
                p_to = Proj(p_to)
            return cls(p_from, p_to)

        def transform(self, x, y):
            if self._from.crs.is_geographic:
                lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
            else:
                lon, lat = self._from(x, y, inverse=True)
            if self._to.crs.is_geographic:
                return lon, lat
            return self._to(lon, lat)

    class CRS:
        def __init__(self, arg):
            self.srs = str(arg)

        @classmethod
        def from_proj4(cls, s):
            return cls(s)

    pyproj.Proj = Proj
    pyproj.Geod = Geod
    pyproj.Transformer = Transformer
    pyproj.CRS = CRS
    pyproj.exceptions = types.ModuleType("pyproj.exceptions")
    pyproj.exceptions.CRSError = ValueError
    return pyproj


# --------------------------------------------------------------------
# xarray facade
# --------------------------------------------------------------------

def _as_label(value):
    """Normalise a coordinate label (datetime/Timestamp/np scalar)."""
    import pandas as pd
    if isinstance(value, _DataArray):
        value = value.values
    if hasattr(value, "to_datetime64"):
        return value.to_datetime64()
    import datetime as _dt
    if isinstance(value, _dt.datetime):
        return np.datetime64(pd.Timestamp(value))
    return value


def _index_of(coord_values, label, method=None):
    label = _as_label(label)
    # backward runs build a DEscending time coordinate
    # (reference basemodel/__init__.py:2083-2135 with negative step);
    # searchsorted needs ascending, so flip and map indices back
    n = len(coord_values)
    descending = n > 1 and coord_values[-1] < coord_values[0]
    sorted_vals = coord_values[::-1] if descending else coord_values

    def _map(i):
        return (n - 1 - i) if descending else i

    if np.ndim(label) > 0:
        labels = np.asarray(label)
        idx = np.searchsorted(sorted_vals, labels)
        return _map(idx) if descending else idx
    if method == "backfill":
        i = int(np.searchsorted(sorted_vals, label, side="left"))
        return _map(i)
    if method in (None, "nearest"):
        idx = int(np.searchsorted(sorted_vals, label, side="left"))
        if method is None:
            if idx >= n or sorted_vals[idx] != label:
                raise KeyError(label)
            return _map(idx)
        if idx > 0 and (idx == n
                        or abs(sorted_vals[idx - 1] - label)
                        <= abs(sorted_vals[idx] - label)):
            return _map(idx - 1)
        return _map(idx)
    raise NotImplementedError(f"sel method {method}")


class _Loc:
    def __init__(self, da):
        self._da = da

    def _resolve(self, key):
        idx = [slice(None)] * self._da.values.ndim
        for dim, label in key.items():
            d = self._da.dims.index(dim)
            idx[d] = _index_of(self._da._coord_values(dim), label)
        return tuple(idx)

    def __getitem__(self, key):
        return self._da.values[self._resolve(key)]

    def __setitem__(self, key, value):
        self._da.values[self._resolve(key)] = value


class _Scalar:
    def __init__(self, v):
        self._v = v

    def item(self):
        return self._v.item() if hasattr(self._v, "item") else self._v


class _DataArray:
    """Minimal xarray.DataArray: shared-buffer views, label indexing on
    sorted coords, attrs exposed as attributes (reference accesses
    ``result.lat.minval`` etc., basemodel/__init__.py:2470-2482)."""

    def __init__(self, data, dims=(), attrs=None, coords=None, name=None):
        self.values = data
        self.dims = tuple(dims)
        self.attrs = dict(attrs or {})
        self.coords = coords or {}
        self.name = name

    def _coord_values(self, dim):
        c = self.coords[dim]
        return c.values if isinstance(c, _DataArray) else np.asarray(c)

    # -- indexing ------------------------------------------------------
    @property
    def loc(self):
        return _Loc(self)

    def __getitem__(self, key):
        vals = self.values[key]
        if np.ndim(vals) == 0 or isinstance(key, (int, np.integer)):
            dims = self.dims[1:] if self.dims else ()
        else:
            dims = self.dims
        coords = dict(self.coords)
        if isinstance(key, (int, np.integer, slice, np.ndarray, list)) \
                and self.dims and self.dims[0] in coords:
            sub = self._coord_values(self.dims[0])[key]
            if np.ndim(sub) == 0:
                coords.pop(self.dims[0], None)
            else:
                coords[self.dims[0]] = sub
        return _DataArray(vals, dims, self.attrs, coords, self.name)

    def __setitem__(self, key, value):
        self.values[key] = value

    def sel(self, indexers=None, method=None, **kw):
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = self
        for dim, label in indexers.items():
            if dim not in out.dims:   # selecting on own values (coord da)
                idx = _index_of(out.values, label, method)
                return _DataArray(out.values[idx], (), out.attrs, {}, out.name)
            d = out.dims.index(dim)
            idx = _index_of(out._coord_values(dim), label, method)
            slicer = [slice(None)] * out.values.ndim
            slicer[d] = idx
            vals = out.values[tuple(slicer)]
            dims = tuple(x for i, x in enumerate(out.dims) if i != d)
            out = _DataArray(vals, dims, out.attrs, dict(out.coords), out.name)
        return out

    def isel(self, indexers=None, drop=False, **kw):
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = self
        for dim, idx in indexers.items():
            d = out.dims.index(dim)
            slicer = [slice(None)] * out.values.ndim
            slicer[d] = idx
            vals = out.values[tuple(slicer)]
            if np.ndim(idx) == 0:
                dims = tuple(x for i, x in enumerate(out.dims) if i != d)
            else:
                dims = out.dims
            coords = dict(out.coords)
            if np.ndim(idx) == 0:
                coords.pop(dim, None)
            elif dim in coords:
                coords[dim] = out._coord_values(dim)[idx]
            out = _DataArray(vals, dims, out.attrs, coords, out.name)
        return out

    # -- reductions / arithmetic ---------------------------------------
    def min(self, skipna=True, dim=None):
        vals = np.asarray(self.values)
        if not np.issubdtype(vals.dtype, np.number):
            return _Scalar(sorted(vals.ravel().tolist())[0]
                           if vals.size else vals)
        return _Scalar(np.nanmin(vals) if skipna else np.min(vals))

    def max(self, skipna=True, dim=None):
        vals = np.asarray(self.values)
        if not np.issubdtype(vals.dtype, np.number):
            return _Scalar(sorted(vals.ravel().tolist())[-1]
                           if vals.size else vals)
        return _Scalar(np.nanmax(vals) if skipna else np.max(vals))

    def notnull(self):
        vals = self.values
        if np.issubdtype(np.asarray(vals).dtype, np.floating):
            return _DataArray(~np.isnan(vals), self.dims, {}, dict(self.coords))
        return _DataArray(np.ones(np.shape(vals), bool), self.dims, {},
                          dict(self.coords))

    def argmax(self, dim=None):
        if dim is None:
            return _DataArray(np.argmax(self.values), ())
        d = self.dims.index(dim)
        vals = np.argmax(self.values, axis=d)
        dims = tuple(x for i, x in enumerate(self.dims) if i != d)
        return _DataArray(vals, dims)

    def __eq__(self, other):
        other_v = other.values if isinstance(other, _DataArray) else _as_label(other)
        return _DataArray(self.values == other_v, self.dims, {}, dict(self.coords))

    __hash__ = None

    def __contains__(self, item):
        return bool(np.any(self.values == _as_label(item)))

    def __add__(self, other):
        if hasattr(other, "to_timedelta64"):
            other = other.to_timedelta64()
        return _DataArray(self.values + other, self.dims, dict(self.attrs),
                          dict(self.coords), self.name)

    def __sub__(self, other):
        other_v = other.values if isinstance(other, _DataArray) else _as_label(other)
        return _DataArray(self.values - other_v, self.dims, {}, dict(self.coords))

    def __truediv__(self, other):
        return _DataArray(self.values / other, self.dims, {}, dict(self.coords))

    def __len__(self):
        return len(self.values)

    def __iter__(self):
        for i in range(len(self.values)):
            yield self[i]

    def __array__(self, dtype=None):
        return np.asarray(self.values, dtype=dtype)

    def __float__(self):
        return float(self.values)

    # -- attrs ----------------------------------------------------------
    def assign_attrs(self, *args, **kw):
        new = dict(self.attrs)
        for a in args:
            new.update(a)
        new.update(kw)
        return _DataArray(self.values, self.dims, new, dict(self.coords),
                          self.name)

    def copy(self, deep=False):
        vals = self.values.copy() if deep and hasattr(self.values, "copy") \
            else self.values
        return _DataArray(vals, self.dims, dict(self.attrs),
                          dict(self.coords), self.name)

    @property
    def T(self):
        return _DataArray(np.asarray(self.values).T, self.dims[::-1],
                          dict(self.attrs), dict(self.coords), self.name)

    def __getattr__(self, key):
        attrs = object.__getattribute__(self, "attrs")
        if key in attrs:
            return attrs[key]
        raise AttributeError(key)


class _Coords(dict):
    def __init__(self, ds):
        super().__init__()
        self._ds = ds

    def __setitem__(self, key, value):
        if isinstance(value, _DataArray):
            value = value.values
        super().__setitem__(key, _DataArray(np.asarray(value), (key,)))

    def __getitem__(self, key):
        return super().__getitem__(key)


class _Dataset:
    """Minimal xarray.Dataset for the reference result buffer."""

    def __init__(self, coords=None, data_vars=None, attrs=None):
        self.attrs = dict(attrs or {})
        self._coords = _Coords(self)
        self._vars = {}
        for name, spec in (coords or {}).items():
            if isinstance(spec, tuple):
                dims, vals = spec[0], spec[1]
                cattrs = spec[2] if len(spec) > 2 else {}
            else:
                vals, cattrs = spec, {}
            vals = np.asarray(vals)
            dict.__setitem__(self._coords, name,
                             _DataArray(vals, (name,), cattrs, name=name))
        for name, spec in (data_vars or {}).items():
            self[name] = spec

    # -- mapping --------------------------------------------------------
    def __setitem__(self, name, spec):
        if isinstance(spec, _DataArray):
            da = spec
            da.name = name
            da.coords = {d: dict.__getitem__(self._coords, d)
                         for d in da.dims if d in self._coords}
        elif not isinstance(spec, tuple):
            # bare scalar / list without dims (reference
            # chemicaldrift.py:390-397 stores run metadata this way);
            # kept OUT of data_vars so the min/max attr tracking of
            # state_to_buffer (reference basemodel/__init__.py:2410)
            # never reduces a string variable
            vals = np.asarray(spec)
            dims = tuple(f"dim_{name}_{i}" for i in range(vals.ndim))
            da = _DataArray(vals, dims, {}, name=name)
            if not hasattr(self, "_extra_vars"):
                object.__setattr__(self, "_extra_vars", {})
            self._extra_vars[name] = da
            return
        else:
            dims, vals = spec[0], np.asarray(spec[1])
            attrs = spec[2] if len(spec) > 2 else {}
            if isinstance(dims, str):
                dims = (dims,)
            da = _DataArray(vals, dims, attrs, name=name)
            da.coords = {d: dict.__getitem__(self._coords, d)
                         for d in dims if d in self._coords}
        self._vars[name] = da

    def __getitem__(self, name):
        if isinstance(name, (list, tuple)):
            sub = _Dataset(attrs=self.attrs)
            sub._coords = self._coords
            for n in name:
                sub._vars[n] = self._vars[n]
            return sub
        if name in self._vars:
            return self._vars[name]
        extra = getattr(self, "_extra_vars", {})
        if name in extra:
            return extra[name]
        return dict.__getitem__(self._coords, name)

    def __contains__(self, name):
        return name in self._vars or name in self._coords \
            or name in getattr(self, "_extra_vars", {})

    def __iter__(self):
        return iter(self._vars)

    def __len__(self):
        return len(self._vars)

    def __getattr__(self, name):
        vars_ = object.__getattribute__(self, "_vars")
        coords = object.__getattribute__(self, "_coords")
        if name in vars_:
            return vars_[name]
        try:
            extra = object.__getattribute__(self, "_extra_vars")
            if name in extra:
                return extra[name]
        except AttributeError:
            pass
        if name in coords:
            return dict.__getitem__(coords, name)
        attrs = object.__getattribute__(self, "attrs")
        if name in attrs:
            return attrs[name]
        raise AttributeError(name)

    # -- structure ------------------------------------------------------
    @property
    def coords(self):
        return self._coords

    @property
    def data_vars(self):
        return dict(self._vars)

    @property
    def sizes(self):
        out = {}
        for name, c in self._coords.items():
            out[name] = len(c.values)
        for da in self._vars.values():
            for d, n in zip(da.dims, np.shape(da.values)):
                out.setdefault(d, n)
        return out

    @property
    def dims(self):
        return self.sizes

    def assign_attrs(self, *args, **kw):
        for a in args:
            self.attrs.update(a)
        self.attrs.update(kw)
        return self

    def copy(self, deep=False):
        new = _Dataset(attrs=dict(self.attrs))
        new._coords = self._coords
        for n, da in self._vars.items():
            new._vars[n] = da.copy(deep=deep)
        return new

    # -- selection ------------------------------------------------------
    def _subset(self, dim, idx):
        new = _Dataset(attrs=dict(self.attrs))
        for n, c in self._coords.items():
            vals = c.values[idx] if n == dim else c.values
            dict.__setitem__(new._coords, n,
                             _DataArray(vals, (n,), c.attrs, name=n))
        for n, da in self._vars.items():
            if dim in da.dims:
                d = da.dims.index(dim)
                slicer = [slice(None)] * da.values.ndim
                slicer[d] = idx
                vals = da.values[tuple(slicer)]
                if np.ndim(idx) == 0:
                    dims = tuple(x for i, x in enumerate(da.dims) if i != d)
                else:
                    dims = da.dims
            else:
                vals, dims = da.values, da.dims
            nda = _DataArray(vals, dims, da.attrs, name=n)
            nda.coords = {d: dict.__getitem__(new._coords, d)
                          for d in dims if d in new._coords}
            new._vars[n] = nda
        return new

    def sel(self, indexers=None, **kw):
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = self
        for dim, sl in indexers.items():
            coord = dict.__getitem__(out._coords, dim).values
            if isinstance(sl, slice):
                n = len(coord)
                descending = n > 1 and coord[-1] < coord[0]
                if descending:
                    # label slice on a DEscending axis (backward runs):
                    # start is the larger label, stop the smaller
                    rev = coord[::-1]
                    lo = 0 if sl.start is None else n - int(
                        np.searchsorted(rev, _as_label(sl.start), "right"))
                    hi = n if sl.stop is None else n - int(
                        np.searchsorted(rev, _as_label(sl.stop), "left"))
                else:
                    lo = 0 if sl.start is None else int(
                        np.searchsorted(coord, _as_label(sl.start), "left"))
                    hi = n if sl.stop is None else int(
                        np.searchsorted(coord, _as_label(sl.stop), "right"))
                out = out._subset(dim, slice(lo, hi))
            else:
                out = out._subset(dim, _index_of(coord, sl))
        return out

    def isel(self, indexers=None, drop=False, **kw):
        indexers = dict(indexers or {})
        indexers.update(kw)
        out = self
        for dim, idx in indexers.items():
            if np.ndim(idx) == 0 and not isinstance(idx, slice):
                idx = int(idx)
            elif not isinstance(idx, slice):
                idx = np.asarray(idx)
            out = out._subset(dim, idx)
            if np.ndim(idx) == 0 and not isinstance(idx, slice):
                # dropped dim: remove its coordinate
                dict.pop(out._coords, dim, None)
        return out


class _NCVar:
    """xarray.Variable facade over a decoded numpy array: dims-aware
    OUTER (orthogonal) indexing — the xarray semantics the reference's
    reader_ROMS_native relies on for its ``var[itzxy]`` box subsetting
    (reference reader_ROMS_native.py:560-590) — plus the attribute
    surface its ctor touches (.data/.values/.attrs/.dims/.chunks/
    .compute/.set_auto_mask)."""

    def __init__(self, data, dims, attrs=None):
        self._data = np.asarray(data)
        self.dims = tuple(dims)
        self.attrs = dict(attrs or {})

    # --- xarray Variable surface
    chunks = None

    def compute(self):
        return self

    def set_auto_mask(self, flag):
        pass

    @property
    def data(self):
        return self._data

    @property
    def values(self):
        return self._data

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def shape(self):
        return self._data.shape

    @property
    def ndim(self):
        return self._data.ndim

    def __len__(self):
        return len(self._data)

    def __array__(self, dtype=None, copy=None):
        a = self._data
        return a.astype(dtype) if dtype is not None else a

    def __iter__(self):
        return iter(self._data)

    def min(self, *a, **k):
        return self._data.min()

    def max(self, *a, **k):
        return self._data.max()

    def __getitem__(self, key):
        """OUTER indexing: integer-array indexers select boxes
        (np.ix_), ints collapse their dimension — xarray.Variable
        semantics, NOT numpy fancy indexing."""
        if not isinstance(key, tuple):
            key = (key,)
        key = key + (slice(None),) * (self._data.ndim - len(key))
        axes = []
        keep = []
        for ax, k in enumerate(key):
            size = self._data.shape[ax]
            if isinstance(k, slice):
                axes.append(np.arange(*k.indices(size)))
                keep.append(True)
            elif isinstance(k, range):
                axes.append(np.asarray(k, dtype=np.intp))
                keep.append(True)
            else:
                arr = np.asarray(k)
                if arr.ndim == 0:
                    axes.append(arr.reshape(1).astype(np.intp))
                    keep.append(False)
                else:
                    if arr.dtype == bool:
                        arr = np.nonzero(arr)[0]
                    axes.append(arr.reshape(-1).astype(np.intp))
                    keep.append(True)
        out = self._data[np.ix_(*axes)]
        squeeze = tuple(ax for ax, kp in enumerate(keep) if not kp)
        if squeeze:
            out = out.squeeze(axis=squeeze)
        dims = tuple(d for d, kp in zip(self.dims, keep) if kp)
        return _NCVar(out, dims, self.attrs)

    def _binop(self, other, op, reflexive=False):
        o = np.asarray(other)
        out = op(o, self._data) if reflexive else op(self._data, o)
        dims = self.dims if out.ndim == self._data.ndim else ()
        return _NCVar(out, dims, {})

    def __add__(self, other):
        return self._binop(other, np.add)

    def __radd__(self, other):
        return self._binop(other, np.add, True)

    def __sub__(self, other):
        return self._binop(other, np.subtract)

    def __rsub__(self, other):
        return self._binop(other, np.subtract, True)

    def __mul__(self, other):
        return self._binop(other, np.multiply)

    def __rmul__(self, other):
        return self._binop(other, np.multiply, True)

    def __truediv__(self, other):
        return self._binop(other, np.divide)

    def rename(self, mapping):
        return _NCVar(self._data,
                      tuple(mapping.get(d, d) for d in self.dims),
                      self.attrs)

    def __repr__(self):
        return f"_NCVar{self.dims}{self._data.shape}"


class _FileDataset:
    """xarray.Dataset facade over an ncio-parsed NetCDF file — the
    surface ``open_dataset_opendrift`` + reader_ROMS_native touch
    (reference readers/__init__.py:37-90, reader_ROMS_native.py:80-310).
    Variables are eagerly CF-decoded (scale/offset/fill) like
    xarray's mask_and_scale."""

    def __init__(self, variables, attrs=None):
        self._vars = dict(variables)
        self.attrs = dict(attrs or {})

    @property
    def variables(self):
        return self._vars

    @property
    def data_vars(self):
        # xarray: data_vars excludes coordinate variables; the facade
        # excludes dimension coordinates (name == own dim), which is
        # what the reference's membership checks need
        return {n: v for n, v in self._vars.items()
                if not (v.ndim == 1 and v.dims == (n,))}

    def __iter__(self):
        return iter(self.data_vars)

    def __len__(self):
        return len(self.data_vars)

    def __contains__(self, name):
        return name in self._vars

    def __getitem__(self, name):
        return self._vars[name]

    def __setitem__(self, name, var):
        self._vars[name] = var

    def drop_vars(self, names, errors="raise"):
        if isinstance(names, str):
            names = [names]
        drop = set(names)
        return _FileDataset({n: v for n, v in self._vars.items()
                             if n not in drop}, self.attrs)

    def filter_by_attrs(self, **kw):
        out = {}
        for n, v in self._vars.items():
            if all(v.attrs.get(k) == val for k, val in kw.items()):
                out[n] = v
        return _FileDataset(out, self.attrs)

    def unify_chunks(self):
        return self

    @property
    def chunks(self):
        return {}

    def close(self):
        pass


_CF_TIME_UNITS = {"seconds": "s", "second": "s", "secs": "s", "sec": "s",
                  "minutes": "m", "minute": "m", "mins": "m",
                  "hours": "h", "hour": "h",
                  "days": "D", "day": "D"}


def _decode_cf_time(var):
    units = var.attrs.get("units", "")
    parts = units.split(" since ")
    if len(parts) != 2 or parts[0].strip() not in _CF_TIME_UNITS:
        return var
    unit = _CF_TIME_UNITS[parts[0].strip()]
    origin_str = parts[1].strip().replace("T", " ")
    from datetime import datetime as _dt
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            origin = _dt.strptime(origin_str.split(".")[0], fmt)
            break
        except ValueError:
            origin = None
    if origin is None:
        return var
    base = np.datetime64(origin, "ns")
    step = np.timedelta64(1, unit).astype("timedelta64[ns]")
    vals = base + (np.asarray(var.data, np.float64)
                   * step.astype(np.int64)).astype("timedelta64[ns]")
    return _NCVar(vals, var.dims, var.attrs)


def _open_nc_dataset(path, decode_times=False, **kw):
    """xr.open_dataset over opendrift_tpu's own NetCDF parser with
    eager CF mask-and-scale decoding."""
    from opendrift_tpu.utils import ncio

    ds = ncio.NCFile(str(path))
    variables = {}
    for name, v in ds.variables.items():
        raw = np.asarray(v[:])
        attrs = dict(v.attrs)
        fv = attrs.get("_FillValue")
        sf = attrs.get("scale_factor")
        ao = attrs.get("add_offset")
        data = raw
        if sf is not None or ao is not None:
            data = raw.astype(np.float64)
            if fv is not None:
                # CF: fill compares against the PACKED values; an
                # unpacked-domain fill (as in the Nordic ROMS subsets,
                # 9.97e36 on int16 data) never matches — same as xarray
                if raw.dtype.kind == "f":
                    data[raw == fv] = np.nan
                else:
                    try:
                        fvi = int(fv)
                        info = np.iinfo(raw.dtype)
                        if info.min <= fvi <= info.max:
                            data[raw == fvi] = np.nan
                    except (OverflowError, ValueError):
                        pass
            data = data * float(sf if sf is not None else 1.0) \
                + float(ao if ao is not None else 0.0)
        elif fv is not None and raw.dtype.kind == "f":
            data = raw.astype(np.float64)
            data[raw == fv] = np.nan
        dims = tuple(getattr(v, "dimensions", ()) or ())
        if len(dims) != raw.ndim:
            dims = tuple(f"dim_{name}_{i}" for i in range(raw.ndim))
        variables[name] = _NCVar(data, dims, attrs)
    out = _FileDataset(variables, dict(getattr(ds, "attrs", {}) or {}))
    if decode_times:
        out = _shim_decode_cf(out)
    return out


def _shim_decode_cf(ds, decode_times=True):
    if not decode_times:
        return ds
    for name in list(ds.variables):
        ds.variables[name] = _decode_cf_time(ds.variables[name])
    return ds


def _build_xarray():
    xr = types.ModuleType("xarray")
    xr.Dataset = _Dataset
    xr.DataArray = _DataArray
    xr.Variable = _NCVar

    def open_dataset(source, *a, **kw):
        return _open_nc_dataset(source,
                                decode_times=kw.get("decode_times", True))

    def open_mfdataset(source, *a, **kw):
        if isinstance(source, (list, tuple)) and len(source) == 1:
            source = source[0]
        if isinstance(source, str):
            import glob as _glob
            matches = sorted(_glob.glob(source))
            if len(matches) == 1:
                source = matches[0]
        if isinstance(source, str):
            ds = _open_nc_dataset(source,
                                  decode_times=kw.get("decode_times",
                                                      True))
            pre = kw.get("preprocess")
            return pre(ds) if pre is not None else ds
        raise NotImplementedError(
            "xarray shim: true multi-file open not supported")

    xr.open_dataset = open_dataset
    xr.open_mfdataset = open_mfdataset
    xr.decode_cf = _shim_decode_cf
    return xr


# --------------------------------------------------------------------
# adios_db (NOAA oil database computations)
# --------------------------------------------------------------------

def _build_adios_db():
    """Shim of the ``adios_db`` surface the reference's OpenOil touches
    (reference adios/oil.py:27-30, openoil.py:97-98): Oil.from_py_json,
    gnome_oil.make_gnome_oil, physical_properties.Density/
    KinematicViscosity, estimations.oil_water_surface_tension_from_api.

    The derivations delegate to tools/build_oil_db.py — the same
    from-scratch GNOME/ADIOS estimation formulas that produced
    opendrift_tpu's bundled oil DB.  NOTE the shared-code caveat: oil
    *property* estimation is therefore identical on both sides of the
    parity comparison by construction; what the goldens validate is the
    weathering DYNAMICS (evaporation ODE, emulsification, budget
    bookkeeping), not the upstream property estimation.
    """
    import build_oil_db as bdb

    adios_db = types.ModuleType("adios_db")

    class _Meta:
        def __init__(self, rec, ok):
            self.gnome_suitable = ok
            self.name = rec.get("metadata", {}).get("name")

    class _ShimAdiosOil:
        """Holds the raw ADIOS JSON record + our derived properties."""

        def __init__(self, rec):
            self.data = rec
            try:
                self.derived = _derive(rec)
                ok = self.derived is not None
            except Exception:
                self.derived = None
                ok = False
            self.metadata = _Meta(rec, ok)

        @classmethod
        def from_py_json(cls, rec):
            return cls(rec)

        def validate(self):
            return []

    def _derive(rec):
        """Raw ADIOS record -> reduced gnome-oil dict (build_oil_db
        pipeline, one oil)."""
        ss = rec.get("sub_samples")
        if not ss:
            return None
        props = ss[0].get("physical_properties", {})
        dens = bdb.extract_density(props)
        api = bdb._get_api(rec, dens[0] if dens else None)
        if dens is None and api is not None:
            sg = 141.5 / (api + 131.5)
            dens = (sg * 999.016, 288.15)
        if dens is None:
            return None
        cuts = ss[0].get("distillation_data", {}).get("cuts", [])
        comp = bdb.components_from_cuts(cuts, api)
        if comp is None:
            return None
        mass_fraction, bp = comp
        viscs = bdb.extract_viscosities(props)
        kvis_ref, kvis_t = viscs[0] if viscs else (50e-6, 288.15)
        mw = bdb.molecular_weight_from_bp(bp)
        return {
            "api": api if api is not None else -999.0,
            "density_ref": dens[0], "density_ref_temp": dens[1],
            "kvis_ref": kvis_ref, "kvis_ref_temp": kvis_t,
            "kvis_k": bdb.visc_temperature_coeff(viscs),
            "mass_fraction": np.asarray(mass_fraction),
            "boiling_point": np.asarray(bp),
            # reference noaa_oil_weathering.py:27 divides by 1000
            # ("database is in g/mol"); ours derives kg/mol
            "molecular_weight": np.asarray(mw) * 1000.0,
            "bullwinkle_time": None,
            "bullwinkle_fraction": bdb.bullwinkle_estimate(api),
            "emulsion_water_fraction_max": bdb.extract_emulsion_max(rec),
        }

    def make_gnome_oil(oil):
        if oil.derived is None:
            raise ValueError("oil not gnome-suitable under shim")
        return dict(oil.derived)

    class Density:
        def __init__(self, oil):
            self._d = oil.derived

        def at_temp(self, t, unit="K"):
            t = np.asarray(t, np.float64)
            if unit in ("C", "degC"):
                t = t + 273.15
            k_rho = 8.0e-4   # thermal expansion, GNOME approximation
            return self._d["density_ref"] / (
                1.0 + k_rho * (t - self._d["density_ref_temp"]))

    class KinematicViscosity:
        def __init__(self, oil):
            self._d = oil.derived

        def at_temp(self, t, temp_units="K", unit=None):
            tu = temp_units if unit is None else unit
            t = np.asarray(t, np.float64)
            if tu in ("C", "degC"):
                t = t + 273.15
            return self._d["kvis_ref"] * np.exp(
                self._d["kvis_k"]
                * (1.0 / t - 1.0 / self._d["kvis_ref_temp"]))

    def oil_water_surface_tension_from_api(api):
        api = float(api) if api and api > 0 else 30.0
        return max(1e-3, 0.001 * (39.0 - 0.2571 * api))

    models = types.ModuleType("adios_db.models")
    models_oil = types.ModuleType("adios_db.models.oil")
    models_oil_oil = types.ModuleType("adios_db.models.oil.oil")
    models_oil_oil.Oil = _ShimAdiosOil
    computation = types.ModuleType("adios_db.computation")
    gnome_mod = types.ModuleType("adios_db.computation.gnome_oil")
    gnome_mod.make_gnome_oil = make_gnome_oil
    pp = types.ModuleType("adios_db.computation.physical_properties")
    pp.Density = Density
    pp.KinematicViscosity = KinematicViscosity
    est = types.ModuleType("adios_db.computation.estimations")
    est.oil_water_surface_tension_from_api = \
        oil_water_surface_tension_from_api

    adios_db.models = models
    models.oil = models_oil
    models_oil.oil = models_oil_oil
    adios_db.computation = computation
    computation.gnome_oil = gnome_mod
    computation.physical_properties = pp
    computation.estimations = est
    for name, mod in [
            ("adios_db", adios_db), ("adios_db.models", models),
            ("adios_db.models.oil", models_oil),
            ("adios_db.models.oil.oil", models_oil_oil),
            ("adios_db.computation", computation),
            ("adios_db.computation.gnome_oil", gnome_mod),
            ("adios_db.computation.physical_properties", pp),
            ("adios_db.computation.estimations", est)]:
        sys.modules[name] = mod
    return adios_db


# --------------------------------------------------------------------
# misc stubs
# --------------------------------------------------------------------

def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _build_selafin_shim():
    """``data_manip.formats.selafin.Selafin`` facade (the Telemac PYTEL
    class the reference's reader_telemac_selafin imports) over
    opendrift_tpu's own Selafin parser.  Shared-code caveat (like the
    adios shim): FILE decoding is ours on both sides; what the goldens
    validate is the reference's unstructured interpolation machinery
    (KD-tree nearest node, layer selection, time blending,
    reference reader_telemac_selafin.py:200-297)."""

    class Selafin:
        def __init__(self, path):
            from opendrift_tpu.utils.selafin import SelafinFile
            sf = SelafinFile(path)
            self._sf = sf
            self.file = {"path": path}
            self.title = sf.title
            nplan = max(sf.iparam[6], 1)
            self.nplan = nplan
            self.npoin2 = sf.n_nodes // nplan
            self.npoin3 = sf.n_nodes
            self.meshx = sf.x[:self.npoin2]
            self.meshy = sf.y[:self.npoin2]
            self.ikle2 = sf.connectivity[:, :3]
            # Telemac stores names padded to 16 chars; the reference's
            # vardic compares against padded strings
            self.varnames = [n.ljust(16) for n in sf.variable_names]
            self.varindex = list(range(len(self.varnames)))
            self.tags = {"times": np.asarray(sf.times_seconds)}
            self.datetime = list(sf.date) if sf.date is not None \
                else [1972, 7, 13, 17, 15, 13]

        def get_variables_at(self, frame, var_indices):
            if len(var_indices) == 0:
                return np.zeros((0, self._sf.n_nodes))
            return np.vstack([
                np.asarray(self._sf.read_variable(int(i), int(frame)),
                           np.float64)
                for i in var_indices])

    data_manip = types.ModuleType("data_manip")
    formats = types.ModuleType("data_manip.formats")
    selafin_mod = types.ModuleType("data_manip.formats.selafin")
    selafin_mod.Selafin = Selafin
    data_manip.formats = formats
    formats.selafin = selafin_mod
    sys.modules["data_manip"] = data_manip
    sys.modules["data_manip.formats"] = formats
    sys.modules["data_manip.formats.selafin"] = selafin_mod


def install():
    """Install all shims into sys.modules (idempotent)."""
    _build_selafin_shim()
    if "pyproj" not in sys.modules:
        sys.modules["pyproj"] = _build_pyproj()
    if "xarray" not in sys.modules:
        sys.modules["xarray"] = _build_xarray()
    if "adios_db" not in sys.modules:
        _build_adios_db()

    class _RoaringLandmask:
        """Backed by opendrift_tpu's bundled coastline raster so the
        reference's coastline machinery (reader_global_landmask +
        coastline_crossing bisection, reference
        basemodel/__init__.py:75-134) operates on the SAME land data as
        the engine under test — stranding parity compares the
        interaction dynamics, not the coastline dataset.  Outside the
        raster's coverage everything is ocean (scenarios stay inside)."""

        _data = None

        @classmethod
        def _load(cls):
            if cls._data is None:
                import os
                path = os.path.join(
                    os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    "opendrift_tpu", "data", "coastline_mask.npz")
                d = np.load(path)
                shape = tuple(d["shape"])
                mask = np.unpackbits(d["land"], axis=1)[:, :shape[1]]
                cls._data = (mask.astype(bool), float(d["lon0"]),
                             float(d["lat0"]), float(d["dlon"]),
                             float(d["dlat"]))
            return cls._data

        @staticmethod
        def new():
            return _RoaringLandmask()

        def contains_many(self, x, y):
            mask, lon0, lat0, dlon, dlat = self._load()
            lon = np.atleast_1d(np.asarray(x, np.float64))
            lat = np.atleast_1d(np.asarray(y, np.float64))
            xi = np.round((lon - lon0) / dlon).astype(np.int64)
            yi = np.round((lat - lat0) / dlat).astype(np.int64)
            inside = ((xi >= 0) & (xi < mask.shape[1] - 1)
                      & (yi >= 0) & (yi < mask.shape[0] - 1))
            out = np.zeros(lon.shape, dtype=bool)
            out[inside] = mask[yi[inside], xi[inside]]
            return out

        def contains(self, x, y):
            return self.contains_many(x, y)

    _stub("roaring_landmask", RoaringLandmask=_RoaringLandmask)

    class _NC4Variable:
        """netCDF4.Variable facade over an ncio variable: attributes
        surface as python attributes (decoded), masked-array reads, CF
        scale/offset/fill decoding — what the reference's FVCOM/SHYFEM
        readers touch (reference reader_netCDF_CF_unstructured.py,
        unstructured/shyfem.py)."""

        def __init__(self, v):
            self.__dict__["_v"] = v
            self.__dict__["dimensions"] = tuple(v.dimensions)
            self.__dict__["shape"] = tuple(v.shape)
            self.__dict__["dtype"] = v.dtype
            attrs = {}
            for k, val in v.attrs.items():
                if isinstance(val, bytes):
                    val = val.decode("utf-8", "replace")
                attrs[k] = val
            self.__dict__["_attrs"] = attrs

        def ncattrs(self):
            return list(self._attrs)

        def getncattr(self, k):
            return self._attrs[k]

        def __getattr__(self, k):
            try:
                return self.__dict__["_attrs"][k]
            except KeyError:
                raise AttributeError(k)

        def __len__(self):
            return self.shape[0] if self.shape else 0

        def __getitem__(self, idx):
            raw = np.asarray(self._v[idx])
            a = self._attrs
            fv = a.get("_FillValue", a.get("missing_value"))
            sf = a.get("scale_factor")
            ao = a.get("add_offset")
            data = raw
            if sf is not None or ao is not None:
                data = raw.astype(np.float64) \
                    * float(sf if sf is not None else 1.0) \
                    + float(ao if ao is not None else 0.0)
            out = np.ma.masked_invalid(np.ma.asarray(data))
            if fv is not None:
                try:
                    out = np.ma.masked_equal(out, type(raw.ravel()[0]
                                                       .item())(fv))
                except Exception:
                    pass
            return out

    class _NC4Dataset:
        def __init__(self, path, mode="r", *a, **kw):
            from opendrift_tpu.utils import ncio
            self.__dict__["_nc"] = ncio.NCFile(str(path))
            self.__dict__["variables"] = {
                n: _NC4Variable(v)
                for n, v in self._nc.variables.items()}
            attrs = {}
            for k, val in getattr(self._nc, "attrs", {}).items():
                if isinstance(val, bytes):
                    val = val.decode("utf-8", "replace")
                attrs[k] = val
            self.__dict__["_attrs"] = attrs

        def ncattrs(self):
            return list(self._attrs)

        def __getitem__(self, name):
            return self.variables[name]

        def __getattr__(self, k):
            try:
                return self.__dict__["_attrs"][k]
            except KeyError:
                raise AttributeError(k)

        def close(self):
            pass

    def _nc4_num2date(times, units, calendar="standard",
                      only_use_cftime_datetimes=False, **kw):
        from opendrift_tpu.utils import ncio
        return np.asarray(ncio.parse_cf_time(units,
                                             np.atleast_1d(times)))

    _stub("netCDF4", Dataset=_NC4Dataset, MFDataset=_NC4Dataset,
          num2date=_nc4_num2date, date2num=lambda *a, **k: None)

    cartopy = _stub("cartopy")
    cartopy.crs = _stub("cartopy.crs", Mercator=object, PlateCarree=object,
                        Stereographic=object,
                        UTM=lambda *a, **k: None)
    class _GSHHSFeature:
        def __init__(self, *a, **kw):
            pass

    cartopy.feature = _stub("cartopy.feature", GSHHSFeature=_GSHHSFeature,
                            Feature=_GSHHSFeature,
                            COLORS={"land": "#efefdb", "water": "#97b6e1",
                                    "land_alt1": "#aedfa3"})
    cartopy.io = _stub("cartopy.io")
    cartopy.io.shapereader = _stub("cartopy.io.shapereader")

    class _ShimPolygon:
        """Enough of shapely.Polygon for the reference's unstructured
        mesh boundary (convex-hull polygon + point-in-polygon test via
        matplotlib.path, reference basereader/unstructured.py:108-145).
        """

        def __init__(self, coords=None, *a, **k):
            self._coords = np.asarray(coords, np.float64) \
                if coords is not None else np.zeros((0, 2))

        @property
        def exterior(self):
            pts = self._coords

            class _Ext:
                xy = (pts[:, 0], pts[:, 1])
                coords = [tuple(p) for p in pts]
            return _Ext()

    class _PreparedPolygon:
        def __init__(self, poly):
            self.context = poly
            from matplotlib.path import Path
            self._path = Path(poly._coords)

        def contains_points(self, pts):
            return self._path.contains_points(pts, radius=1e-9)

    def _vectorized_contains(prepped, x, y):
        pts = np.column_stack([np.atleast_1d(x).ravel(),
                               np.atleast_1d(y).ravel()])
        if isinstance(prepped, _PreparedPolygon):
            return prepped.contains_points(pts)
        from matplotlib.path import Path
        return Path(prepped._coords).contains_points(pts, radius=1e-9)

    shapely = _stub("shapely",
                    clip_by_rect=lambda *a, **k: None,
                    wkb=None)
    shapely.geometry = _stub("shapely.geometry", box=lambda *a, **k: None,
                             Polygon=_ShimPolygon, MultiPolygon=object,
                             Point=object, shape=lambda *a, **k: None,
                             asPolygon=lambda *a, **k: None)
    shapely.wkb = _stub("shapely.wkb", loads=lambda *a, **k: None)
    shapely.wkt = _stub("shapely.wkt", loads=lambda *a, **k: None)
    shapely.ops = _stub("shapely.ops")
    shapely.prepared = _stub("shapely.prepared",
                             prep=lambda p: _PreparedPolygon(p))
    shapely.vectorized = _stub("shapely.vectorized",
                               contains=_vectorized_contains)

    def _gj(kind):
        def make(coords=None, **kw):
            return {"type": kind, "coordinates": coords, **kw}
        return make

    def _gj_feature(geometry=None, properties=None):
        return {"type": "Feature", "geometry": geometry,
                "properties": properties}

    def _gj_fc(features):
        return {"type": "FeatureCollection", "features": list(features)}

    geojson = _stub("geojson", Point=_gj("Point"),
                    LineString=_gj("LineString"), Polygon=_gj("Polygon"),
                    Feature=_gj_feature, FeatureCollection=_gj_fc,
                    loads=lambda s: json.loads(s),
                    dumps=lambda o, **k: json.dumps(o, **k))
    geojson.utils = _stub("geojson.utils")
    _stub("copernicusmarine")
    _stub("cmocean", cm=types.SimpleNamespace())

    def _utm_from_latlon(lat, lon):
        """Zone lookup only (the reference's eulerdrift srs.py uses just
        the zone number); standard 6-degree zones with the Norway and
        Svalbard exceptions."""
        zone = int((float(lon) + 180.0) // 6) + 1
        lat = float(lat)
        lon = float(lon)
        if 56 <= lat < 64 and 3 <= lon < 12:
            zone = 32
        if 72 <= lat < 84:
            if 0 <= lon < 9:
                zone = 31
            elif 9 <= lon < 21:
                zone = 33
            elif 21 <= lon < 33:
                zone = 35
            elif 33 <= lon < 42:
                zone = 37
        return (None, None, zone, None)

    _stub("utm", from_latlon=_utm_from_latlon)

    fields = {"asctime": {}, "levelname": {"color": "magenta"},
              "name": {}, "lineno": {}}

    def _coloredlogs_install(level=20, fmt=None, datefmt=None,
                             field_styles=None, **kw):
        import logging
        h = logging.StreamHandler()
        if fmt:
            h.setFormatter(logging.Formatter(fmt, datefmt))
        lg = logging.getLogger("opendrift")
        lg.addHandler(h)

    _stub("coloredlogs", DEFAULT_FIELD_STYLES=fields,
          install=_coloredlogs_install)
