#!/usr/bin/env python
"""Inspect any forcing data source
(reference: opendrift/scripts/readerinfo.py)."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source", help="Path or <scheme>://path of data source")
    p.add_argument("-p", "--plot", action="store_true",
                   help="Plot the first variable's first frame")
    args = p.parse_args()

    from opendrift_tpu.fields.factory import reader_from_url
    r = reader_from_url(args.source)
    print(r)
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
        r.set_run_epoch(r.start_time or __import__("datetime")
                        .datetime.now())
        var = r.variables[0]
        frame = r._load_frame(var, 0) if hasattr(r, "_load_frame") else None
        if frame is not None:
            plt.imshow(np.atleast_3d(frame.T)[..., 0].T, origin="lower")
            plt.colorbar(label=var)
            plt.title(f"{r.name}: {var}")
            out = "readerinfo.png"
            plt.savefig(out, dpi=110)
            print(f"Wrote {out}")


if __name__ == "__main__":
    main()
