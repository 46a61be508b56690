#!/usr/bin/env python
"""Progressive-vector (hodograph) plot of currents at a position
(reference: opendrift/scripts/hodograph.py)."""

import argparse
from datetime import timedelta


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", help="Forcing data source")
    p.add_argument("--lon", type=float, required=True)
    p.add_argument("--lat", type=float, required=True)
    p.add_argument("-z", type=float, default=0.0)
    p.add_argument("-o", "--output", default="hodograph.png")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from opendrift_tpu.fields.factory import reader_from_url

    r = reader_from_url(args.source)
    r.set_run_epoch(r.start_time)
    r.prepare(interval_seconds=(r.end_time
                                - r.start_time).total_seconds())
    dev = r.device_state(r.start_time, r.end_time)
    total = (r.end_time - r.start_time).total_seconds()
    times = np.linspace(0, total, 50)
    us, vs = [], []
    for t in times:
        vals, cov = r.sample(dev,
                             ["x_sea_water_velocity",
                              "y_sea_water_velocity"],
                             jnp.float32(t),
                             jnp.asarray([args.lon], dtype=jnp.float32),
                             jnp.asarray([args.lat], dtype=jnp.float32),
                             jnp.asarray([args.z], dtype=jnp.float32))
        us.append(float(vals["x_sea_water_velocity"][0]))
        vs.append(float(vals["y_sea_water_velocity"][0]))
    dt = times[1] - times[0]
    x = np.cumsum(np.asarray(us)) * dt / 1000.0
    y = np.cumsum(np.asarray(vs)) * dt / 1000.0
    plt.plot(x, y, "-o", ms=2)
    plt.xlabel("East displacement [km]")
    plt.ylabel("North displacement [km]")
    plt.title(f"Progressive vector at ({args.lon}, {args.lat}), "
              f"z={args.z} m")
    plt.axis("equal")
    plt.savefig(args.output, dpi=110, bbox_inches="tight")
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
