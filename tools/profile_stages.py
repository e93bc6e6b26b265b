"""Per-stage device timing of the 1080p P pipeline on the real chip.

Times each jitted program separately with block_until_ready (device time,
tunnel-latency excluded apart from the dispatch itself):
  * prep  (ME + analysis + uniformization)
  * scan  (CTU wavefront lax.scan only)
  * finish (deblock + SAO + packing only)
  * main  (scan + finish fused, the shipping program)

Usage: python tools/profile_stages.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def timeit(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    from x265_tpu.common.params import Params
    from x265_tpu.encoder import Encoder
    from x265_tpu.encoder.device_pipeline import build_p_pipeline

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    p = Params(source_width=w, source_height=h, qp=32,
               decoded_picture_hash=3)
    enc = Encoder(p)
    g = enc.geom
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    nctb = g.n_ctbs
    rng = np.random.RandomState(0)

    def plane(hh, ww):
        return jnp.asarray(rng.randint(0, 255, (hh, ww), np.uint8))

    oy, ocb, ocr = plane(ph, pw), plane(ph // 2, pw // 2), plane(
        ph // 2, pw // 2)
    mr = enc.me_range
    ry = plane(ph + 2 * (mr + 4) + 8, pw + 2 * (mr + 4) + 8)
    rcb = plane((ph + 2 * (mr + 4) + 8) // 2, (pw + 2 * (mr + 4) + 8) // 2)
    rcr = rcb
    nr = min(3, max(1, enc.num_ref))
    pipe = build_p_pipeline(enc, nr=nr)
    qp = np.int32(32)
    qpv = jnp.full((nctb,), 32, jnp.int32)
    lam = jnp.full((nctb,), 10.0, jnp.float32)
    from x265_tpu.encoder.device_pipeline import ref_idx_bits
    rbits = ref_idx_bits(nr, nr)

    t_prep, prep_out = timeit(
        pipe.prep, oy, (ry,) * nr, (rcb,) * nr, (rcr,) * nr, qp, rbits,
        np.int32(64), np.int32(0))
    print(f"prep: {t_prep*1e3:.1f} ms")

    (modes, mode32, mv, rsel, inter, pred_y, pred_cb, pred_cr,
     cost_p, cost_i) = prep_out

    ref_pocs = jnp.zeros((nr,), jnp.int32)
    t_main, main_out = timeit(
        pipe.main, oy, ocb, ocr, modes, mode32, mv, rsel, inter,
        pred_y, pred_cb, pred_cr, qpv, qpv, qpv, lam, qp, 0, 0,
        jnp.float32(100.0), qpv, ref_pocs, None)
    print(f"main (scan+finish): {t_main*1e3:.1f} ms")

    # scan alone
    scan = enc._get_ctu_scan()
    B32 = scan.t["b32_n"]
    run_scan = jax.jit(scan.scan_fn(inter=True, decide32=True))
    t_scan, scan_out = timeit(
        run_scan, oy, ocb, ocr, modes, mode32, jnp.zeros((B32,), bool),
        qpv, qpv, qpv, lam, inter, pred_y, pred_cb, pred_cr,
        None, None, None)
    print(f"scan alone: {t_scan*1e3:.1f} ms")

    # finish alone
    from x265_tpu.encoder.device_pipeline import _filter_stage_builder
    finish = _filter_stage_builder(enc)

    def fin(oy, ocb, ocr, scan_out, qpv):
        return finish((oy, ocb, ocr), scan_out, qp, 0, 0,
                      jnp.float32(100.0), inter=inter, mv=mv,
                      qp_base_ctb=qpv)[0]

    fin_j = jax.jit(fin)
    t_fin, _ = timeit(fin_j, oy, ocb, ocr, scan_out, qpv)
    print(f"finish alone: {t_fin*1e3:.1f} ms")
    print(f"TOTAL prep+main: {(t_prep+t_main)*1e3:.1f} ms "
          f"-> {1.0/(t_prep+t_main):.2f} fps equivalent")


if __name__ == "__main__":
    main()
