"""Eulerian solver: advect-diffuse a Gaussian concentration blob
(reference parity: examples/example_eulerdrift.py)."""

import numpy as np

from opendrift_tpu.models.eulerdrift import ExplSimulation

s = ExplSimulation.new(lon0=10.0, lat0=65.0, res=20.0,
                       shape=(128, 128), D=2.0)
s.readers.append(lambda lons, lats, t: (
    np.full(lons.shape, 0.3, np.float32),    # u = 0.3 m/s east
    np.full(lons.shape, 0.15, np.float32)))  # v = 0.15 m/s north
s.grid.source_gaussian_blob(10.02, 65.01, A=1.0, N=21, sigma=80.0)

m0 = s.grid.total_mass()
final, snaps = s.integrate(dt=10.0, max_steps=120, store_every=30)
print(f"mass: {m0:.1f} -> {s.grid.total_mass():.1f} "
      f"(conserved to {100*abs(s.grid.total_mass()-m0)/m0:.3f}%)")
peaks = np.asarray(snaps).max(axis=(1, 2))
print("peak concentration over time:", np.round(peaks, 3))
