"""Panorama runner (reference tests/test_panorama.cpp + test_stitch.cpp).

    python -m dr3_tpu.run_panorama --dir /root/reference/imgs/yosemite
    python -m dr3_tpu.run_panorama --dir ... --mode translate --focal 315.5
    python -m dr3_tpu.run_panorama --pair left.jpg right.jpg   # single stitch
"""

from __future__ import annotations

# direct-script invocation (python dr3_tpu/run_X.py) from any cwd: put the
# repo root on sys.path so the package imports resolve
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default=None, help="directory of overlapping images")
    ap.add_argument("--pair", nargs=2, default=None, help="stitch two images")
    ap.add_argument("--mode", choices=["homography", "translate"],
                    default="homography")
    ap.add_argument("--focal", type=float, default=0.0,
                    help="focal length for translate/spherical mode "
                         "(reference test_stitch uses 315.5 for the drone set)")
    ap.add_argument("--feather", type=int, default=40)
    ap.add_argument("--out", default="panorama.png")
    args, unknown = ap.parse_known_args(argv)

    from dr3_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from dr3_tpu.io.image import load_image, save_image
    from dr3_tpu.utils.config import Config

    cfg = Config.from_cli(unknown)

    if args.pair:
        from dr3_tpu.pipelines.stitch import Stitch

        s = Stitch(cfg, translate_only=args.mode == "translate",
                   focal_length=args.focal)
        out, H = s.process(load_image(args.pair[0]), load_image(args.pair[1]))
        save_image(out, args.out)
        print("H (right->left):\n", H)
    else:
        if not args.dir:
            ap.error("--dir or --pair required")
        from dr3_tpu.pipelines.panorama import Panorama, PanType

        pan = Panorama(
            focal_length=args.focal,
            pan_type=PanType.TRANSLATE if args.mode == "translate" else PanType.HOMOGRAPHY,
            feathering_width=args.feather, cfg=cfg)
        out = pan.process_dir(args.dir)
        save_image(out, args.out)
        print(pan.monitor.report())
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
