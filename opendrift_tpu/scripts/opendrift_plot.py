#!/usr/bin/env python
"""Plot a trajectory output file
(reference: opendrift/scripts/opendrift_plot.py:26-42)."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename", help="Trajectory NetCDF file")
    p.add_argument("-o", "--output", default=None,
                   help="Output image (default: <filename>.png)")
    p.add_argument("-b", "--buffer", type=float, default=0.1)
    p.add_argument("-c", "--linecolor", default=None,
                   help="Colour trajectories by this variable")
    args = p.parse_args()

    import opendrift_tpu
    o = opendrift_tpu.open(args.filename)
    out = args.output or args.filename + ".png"
    o.plot(buffer=args.buffer, linecolor=args.linecolor, filename=out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
