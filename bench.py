"""Benchmark driver entry point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures end-to-end 1080p IPPP (P-slice GOP) encode throughput — the
BASELINE.md north-star metric: >= 30 fps 1080p per chip == vs_baseline 1.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


def synthetic_frame(w, h, seed=0):
    """Natural-ish content: smooth structures + texture + a little noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 41.0) * np.cos(yy / 29.0)
         + 40 * np.sin((xx + yy) / 97.0)
         + rng.randint(-6, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin(xx[::2, ::2] / 53.0)).clip(0, 255).astype(np.uint8)
    v = (128 + 40 * np.cos(yy[::2, ::2] / 67.0)).clip(0, 255).astype(np.uint8)
    return y, u, v


def main():
    from x265_tpu.common.params import Params
    from x265_tpu.encoder import Encoder

    w, h = 1920, 1080
    n_frames = int(os.environ.get("BENCH_FRAMES", "10"))
    clip = os.environ.get("BENCH_CLIP")       # optional real Y4M content
    if clip:
        from x265_tpu.io.y4m import Y4MReader
        rd = Y4MReader(clip)
        w, h = rd.width, rd.height
        frames = []
        for fr in rd:
            frames.append(fr)
            if len(frames) >= n_frames:
                break
        n_frames = len(frames)
    else:
        base = synthetic_frame(w, h, 0)
        # panning content: a realistic medium-quality workload
        frames = [(np.roll(base[0], 3 * t, axis=1), base[1], base[2])
                  for t in range(n_frames)]

    # MEDIUM-EQUIVALENT config (the BASELINE.json north-star shape, not
    # CQP-flat): AQ + cuTree + B frames with b-pyramid + weightp +
    # multi-ref, streaming/pipelined encode; decoded-picture-hash SEI is
    # the D.3.19 checksum computed on device (verified by dec265 -c /
    # the in-repo decoder exactly like MD5)
    p = Params(source_width=w, source_height=h, qp=32,
               decoded_picture_hash=3)
    enc = Encoder(p)
    # warmup: compile every device pipeline the GOP pattern uses
    enc.headers()
    for fr in frames[:min(7, n_frames)]:
        enc.push_frame(fr)
    enc.flush()

    # median-of-N timed runs: the device tunnel is a shared, noisy
    # resource (identical runs measured 0.7-2.0 fps in round 4), so a
    # single run is barely signal.  The median + the per-run spread are
    # both reported.
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        total_bytes = 0
        for fr in frames:
            for ef in enc.push_frame(fr):
                total_bytes += len(ef.au)
        for ef in enc.flush():
            total_bytes += len(ef.au)
        dt = time.time() - t0
        runs.append(round(n_frames / dt, 4))
    fps = sorted(runs)[len(runs) // 2]

    print(json.dumps({
        "metric": "1080p_medium_encode_fps",
        "value": fps,
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "runs": runs,
        "frames": n_frames,
    }))


if __name__ == "__main__":
    main()
