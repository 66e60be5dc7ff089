"""End-point-error evaluation of flow/depth outputs.

The reference validated itself against the Sintel/Middlebury benchmark
servers (SURVEY.md section 4; reference README.md:90-93). This is the
local equivalent: compare computed .flo/.pfm files against ground truth.

Usage:
  python tools/eval_epe.py out.flo gt.flo           # one pair
  python tools/eval_epe.py OUT_DIR GT_DIR           # aggregate over a dir
Prints mean EPE, and for directories the per-file breakdown plus the
standard Sintel accuracy buckets (% of pixels with EPE > 1/3/5 px).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from of_dis_tpu.utils import io  # noqa: E402


def _load(path):
    if path.endswith(".pfm"):
        # depth: 1-channel; read back the negated-disparity convention
        with open(path, "rb") as f:
            assert f.readline().strip() == b"Pf"
            w, h = map(int, f.readline().split())
            scale = float(f.readline())
            data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
        return data.reshape(h, w, 1)[::-1]      # bottom-up rows
    return io.read_flo(path)


def epe_stats(flow, gt):
    """(mean EPE, %>1px, %>3px, %>5px) over pixels with finite gt.

    Sintel convention: gt values > 1e9 (or non-finite) mark invalid/
    unknown pixels and are excluded.
    """
    nc = min(flow.shape[2], gt.shape[2], 2)
    d = flow[:, :, :nc].astype(np.float64) - gt[:, :, :nc].astype(np.float64)
    err = np.sqrt(np.sum(d * d, axis=2))
    valid = np.all(np.isfinite(gt[:, :, :nc])
                   & (np.abs(gt[:, :, :nc]) < 1e9), axis=2)
    err = err[valid]
    if err.size == 0:
        return float("nan"), 0.0, 0.0, 0.0
    return (float(err.mean()),
            float((err > 1).mean() * 100),
            float((err > 3).mean() * 100),
            float((err > 5).mean() * 100))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(__doc__)
        return 2
    a, b = argv
    if os.path.isdir(a):
        names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
        names = [n for n in names if n.endswith((".flo", ".pfm"))]
        if not names:
            print(f"no common .flo/.pfm files under {a} and {b}")
            return 1
        tot, n_px = 0.0, 0
        for name in names:
            fl, gt = _load(os.path.join(a, name)), _load(os.path.join(b, name))
            epe, p1, p3, p5 = epe_stats(fl, gt)
            k = fl.shape[0] * fl.shape[1]
            tot += epe * k
            n_px += k
            print(f"{name}: EPE {epe:.4f}  >1px {p1:.2f}%  >3px {p3:.2f}%"
                  f"  >5px {p5:.2f}%")
        print(f"mean over {len(names)} files: EPE {tot / n_px:.4f}")
    else:
        epe, p1, p3, p5 = epe_stats(_load(a), _load(b))
        print(f"EPE {epe:.4f}  >1px {p1:.2f}%  >3px {p3:.2f}%  >5px {p5:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
