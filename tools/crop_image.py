"""Paper-figure crop utility (reference test.py:1-28, generalized to a CLI).

Reads a rendered PNG (alpha-composited onto white if RGBA), crops the
[x0:x1, y0:y1] region and writes it out.

Usage: python tools/crop_image.py IN.png OUT.png --x0 300 --y0 300 --x1 500 --y1 500
"""

import argparse

import imageio.v2 as imageio
import numpy as np


def to8b(x):
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def read_image(path):
    """RGBA composited onto white, like the reference (test.py:12-17)."""
    image = (np.asarray(imageio.imread(path)) / 255.0).astype(np.float32)
    if image.shape[-1] == 4:
        image = image[..., :3] * image[..., -1:] + (1.0 - image[..., -1:])
    return to8b(image)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--x0", type=int, default=300)
    ap.add_argument("--y0", type=int, default=300)
    ap.add_argument("--x1", type=int, default=500)
    ap.add_argument("--y1", type=int, default=500)
    args = ap.parse_args()
    img = read_image(args.input)
    imageio.imwrite(args.output, img[args.y0:args.y1, args.x0:args.x1])
    print(f"wrote {args.output} "
          f"({args.y1 - args.y0}x{args.x1 - args.x0} crop)")


if __name__ == "__main__":
    main()
