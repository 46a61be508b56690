"""GRIB2 parser + reader (reference parity: opendrift/readers/
reader_grib.py; wider — polar-stereo + JPEG2000 supported here)."""

import os
import struct

import numpy as np
import pytest

CMC = ("/root/reference/tests/test_data/"
       "CMC_caps_HGT_ISBL_0050_ps3km_2018090900_P005.grib2")


@pytest.mark.skipif(not os.path.exists(CMC), reason="no GRIB test data")
def test_grib2_jpeg2000_polar_stereo():
    from opendrift_tpu.utils.grib2 import Grib2File
    g = Grib2File(CMC)
    assert len(g.messages) == 1
    m = g.messages[0]
    assert m.standard_name == "geopotential_height"
    assert m.packing_template == 40  # JPEG2000
    assert m.grid_template == 20     # polar stereographic
    assert m.shape == (1880, 2097)
    assert m.valid_time.strftime("%Y%m%d%H") == "2018090905"
    v = m.values()
    # 50 hPa geopotential heights: ~19-27 km
    assert 19000 < np.nanmin(v) < np.nanmax(v) < 28000
    assert np.isfinite(v).all()


@pytest.mark.skipif(not os.path.exists(CMC), reason="no GRIB test data")
def test_grib_reader_sampling():
    import jax.numpy as jnp
    from opendrift_tpu.fields.grib import GribReader
    r = GribReader(CMC)
    assert r.variables == ["geopotential_height"]
    # sample mid-grid (Canadian Arctic Prediction System cap domain)
    lon = np.array([-90.0, -93.5])
    lat = np.array([80.0, 72.0])
    assert r.covers_positions(lon, lat).all()
    fr = r._read_frame("geopotential_height", 0, slice(None),
                       slice(None), slice(None))
    assert 19000 < np.nanmean(fr) < 28000


def _simple_packed_message(values, ni, nj):
    """Hand-build a minimal GRIB2 lat-lon simple-packed message."""
    nbits = 16
    D = 2
    # GRIB2: Y * 10^D = R + X * 2^E, with R in scaled units
    R = float(values.min()) * 10.0 ** D
    E = 0
    scaled = np.round(values * 10.0 ** D - R).astype(np.uint64)
    while scaled.max() >= (1 << nbits):
        E += 1
        scaled = np.round((values * 10.0 ** D - R) / 2.0 ** E
                          ).astype(np.uint64)
    bits = np.zeros(len(scaled) * nbits, dtype=np.uint8)
    for i, x in enumerate(scaled):
        for b in range(nbits):
            bits[i * nbits + b] = (int(x) >> (nbits - 1 - b)) & 1
    payload = np.packbits(bits).tobytes()

    def sec(num, body):
        return struct.pack(">IB", 5 + len(body), num) + body

    # centre, subcentre, tables, sig-ref, Y M D h m s, status, type
    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 54, 0, 2, 1, 0,
                            2020, 1, 1, 0, 0, 0, 0, 1))
    # grid template 3.0: lat/lon from (50N,0E) to (51N,1E)
    g = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 0)
    g += struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)  # earth shape
    g += struct.pack(">II", ni, nj)
    g += struct.pack(">II", 0, 0)  # basic angle/subdiv
    g += struct.pack(">iiB", 50_000_000, 0, 0x30)           # la1 lo1 res
    g += struct.pack(">ii", 51_000_000, 1_000_000)          # la2 lo2
    g += struct.pack(">IIB", 1_000_000 // max(ni - 1, 1),
                     1_000_000 // max(nj - 1, 1), 0x40)     # di dj scan
    s3 = sec(3, g)
    # product template 4.0: ncoord, tmpl, cat=2 num=2 (x_wind), process,
    # bg, genid, cutoff h/m, time unit=1 (h), fct=0, surface 1 + surface 2
    p = struct.pack(">HHBBBBBHBBI", 0, 0, 2, 2, 0, 0, 0, 0, 0, 1, 0)
    p += struct.pack(">BBI", 1, 0, 10)     # first surface: height 10
    p += struct.pack(">BBI", 255, 0, 0)    # second surface: missing
    s4 = sec(4, p)
    s5 = sec(5, struct.pack(">IHfhhBB", ni * nj, 0,
                            np.float32(R), E, D, nbits, 0))
    s6 = sec(6, b"\xff")
    s7 = sec(7, payload)
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    s0 = b"GRIB" + b"\x00\x00" + bytes([0, 2]) \
        + struct.pack(">Q", 16 + len(body))
    return s0 + body


def test_grib2_simple_packing_roundtrip(tmp_path):
    from opendrift_tpu.utils.grib2 import Grib2File
    ni, nj = 8, 5
    rng = np.random.default_rng(3)
    truth = rng.uniform(0.0, 12.0, (nj, ni))
    path = str(tmp_path / "simple.grib2")
    with open(path, "wb") as f:
        f.write(_simple_packed_message(truth.ravel(), ni, nj))
    g = Grib2File(path)
    m = g.messages[0]
    assert m.standard_name == "x_wind"
    assert m.packing_template == 0
    v = m.values()
    assert v.shape == (nj, ni)
    assert np.max(np.abs(v - truth)) < 0.02  # D=2 quantisation
