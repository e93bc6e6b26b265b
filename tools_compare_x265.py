"""RD comparison harness: x265_tpu vs the reference x265 1.9 binary.

Encodes the same clip with both encoders at matched settings across a QP
sweep and reports per-point (kbps, PSNR-Y) plus BD-rate/BD-PSNR.
Requires the reference oracle build at .oracle/x265build/x265 (see
.claude/skills/verify/SKILL.md for the libde265 oracle; x265 builds the
same way from /root/reference/x265_1.9/source).

Usage: python tools_compare_x265.py [--frames N] [--size WxH]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

X265 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    ".oracle", "x265build", "x265")


def make_clip(w, h, n):
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 70 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
            + 35 * np.sin((2 * xx + yy) / 53.0))
    frames = []
    for t in range(n):
        y = (np.roll(base, 2 * t, axis=1) + np.roll(base, t, axis=0) / 3
             + rng.randint(-4, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 45 * np.sin((xx[::2, ::2] + 7 * t) / 31.0)
             ).astype(np.uint8)
        v = (128 + 45 * np.cos((yy[::2, ::2] - 5 * t) / 41.0)
             ).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def psnr(a, b, maxval=255.0):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))
                  ** 2)
    return 10 * np.log10(maxval * maxval / mse)


def run_ours(frames, w, h, qp, fps=25, mode="matched"):
    from x265_tpu.common.params import Params
    from x265_tpu.encoder import Encoder

    if mode == "medium":
        # full defaults: B frames + AQ + cuTree + lookahead + weightp
        p = Params(source_width=w, source_height=h, qp=qp, fps_num=fps,
                   log_level=0)
    else:
        p = Params(source_width=w, source_height=h, qp=qp, fps_num=fps,
                   bframes=0, aq_mode=0, weightp=False, ref=1,
                   log_level=0)
    enc = Encoder(p)
    bits = 0
    ps = []
    t0 = time.time()
    efs = []
    for fr in frames:
        efs += enc.push_frame(fr)
    efs += enc.flush()
    el = time.time() - t0
    for ef in sorted(efs, key=lambda e: e.display_idx):
        bits += len(ef.au) * 8
        ps.append(psnr(ef.recon[0], frames[ef.display_idx][0]))
    kbps = bits * fps / (len(frames) * 1000)
    return kbps, float(np.mean(ps)), len(frames) / el


def run_x265(y4m_path, frames, w, h, qp, fps=25, mode="matched"):
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "o.265")
        rec = os.path.join(td, "rec.yuv")
        cmd = [X265, "--input", y4m_path, "--y4m", "-o", out,
               "--qp", str(qp), "--preset", "medium", "--no-wpp",
               "--keyint", "250", "--no-sao-non-deblock",
               "--recon", rec, "--no-progress", "--log-level", "error"]
        if mode == "matched":
            cmd += ["--bframes", "0", "--ref", "1"]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1200)
        assert r.returncode == 0, r.stderr
        bits = os.path.getsize(out) * 8
        raw = np.fromfile(rec, np.uint8)
        fsz = w * h * 3 // 2
        ps = []
        for i, fr in enumerate(frames):
            y = raw[i * fsz:i * fsz + w * h].reshape(h, w)
            ps.append(psnr(y, fr[0]))
        kbps = bits * fps / (len(frames) * 1000)
        return kbps, float(np.mean(ps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--mode", default="matched",
                    choices=["matched", "medium"],
                    help="matched: both no-B/1-ref; medium: full defaults "
                         "(ours B+AQ+cuTree+weightp vs x265 medium)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))
    frames = make_clip(w, h, args.frames)

    from x265_tpu.io import write_y4m
    y4m = tempfile.NamedTemporaryFile(suffix=".y4m", delete=False)
    write_y4m(y4m.name, frames, w, h)

    qps = [int(q) for q in args.qps.split(",")]
    ours, ref = [], []
    for qp in qps:
        ko, po, fps_o = run_ours(frames, w, h, qp, mode=args.mode)
        kr, pr = run_x265(y4m.name, frames, w, h, qp, mode=args.mode)
        ours.append((ko, po))
        ref.append((kr, pr))
        print(f"qp {qp}: ours {ko:8.1f} kbps {po:6.3f} dB ({fps_o:.2f} fps)"
              f" | x265 {kr:8.1f} kbps {pr:6.3f} dB", flush=True)
    from x265_tpu.tools.bdrate import bd_psnr, bd_rate
    anchor = ("x265 medium" if args.mode == "medium"
              else "x265 medium/no-B/1-ref")
    try:
        bdr = f"{bd_rate(ref, ours):+.2f}%"
    except ValueError:
        bdr = "n/a (no PSNR overlap)"
    try:
        bdp = f"{bd_psnr(ref, ours):+.3f} dB"
    except ValueError:
        bdp = "n/a (no rate overlap)"
    print(f"BD-rate (ours vs {anchor}): {bdr}  BD-PSNR: {bdp}")
    os.unlink(y4m.name)


if __name__ == "__main__":
    main()
