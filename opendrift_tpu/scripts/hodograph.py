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

    from datetime import datetime

    r = reader_from_url(args.source)
    # continuous/analytic sources carry no time bounds: use a 24 h window
    start = r.start_time or getattr(r, "zero_time", None) \
        or datetime(2000, 1, 1)
    end = r.end_time or start + timedelta(hours=24)
    r.set_run_epoch(start)
    r.prepare(interval_seconds=(end - start).total_seconds())
    dev = r.device_state(start, end)
    total = (end - start).total_seconds()
    times = np.linspace(0, total, 50)
    want = [v for v in ("x_sea_water_velocity", "y_sea_water_velocity")
            if v in r.variables]
    us, vs = [], []
    for t in times:
        vals, cov = r.sample(dev, want,
                             jnp.float32(t),
                             jnp.asarray([args.lon], dtype=jnp.float32),
                             jnp.asarray([args.lat], dtype=jnp.float32),
                             jnp.asarray([args.z], dtype=jnp.float32))
        us.append(float(vals.get("x_sea_water_velocity",
                                 jnp.zeros(1))[0]))
        vs.append(float(vals.get("y_sea_water_velocity",
                                 jnp.zeros(1))[0]))
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
