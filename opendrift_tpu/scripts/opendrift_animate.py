#!/usr/bin/env python
"""Animate a trajectory output file
(reference: opendrift/scripts/opendrift_animate.py)."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename", help="Trajectory NetCDF file")
    p.add_argument("-o", "--output", default=None,
                   help="Output animation (.gif/.mp4)")
    p.add_argument("-b", "--buffer", type=float, default=0.1)
    p.add_argument("-c", "--color", default=None)
    p.add_argument("--fps", type=int, default=8)
    args = p.parse_args()

    import opendrift_tpu
    o = opendrift_tpu.open(args.filename)
    out = args.output or args.filename + ".gif"
    o.animation(buffer=args.buffer, color=args.color, filename=out,
                fps=args.fps)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
