"""Bit-exactness check: Pallas scan step vs the jnp lax.scan step.

Runs both paths on the real TPU (or interpret mode with
X265_PALLAS=interp on CPU) over a small geometry and asserts identical
outputs for the I and P configurations.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from x265_tpu.common.geometry import PictureGeometry
    from x265_tpu.encoder.ctu_scan import CtuScan

    w, h = int(os.environ.get("CPW", "192")), int(os.environ.get("CPH", "128"))
    rng = np.random.RandomState(7)
    g = PictureGeometry(w, h, 6, 3)
    ph, pw = g.ctbs_h << 6, g.ctbs_w << 6
    oy = jnp.asarray(rng.randint(0, 256, (ph, pw), np.uint8))
    ocb = jnp.asarray(rng.randint(0, 256, (ph // 2, pw // 2), np.uint8))
    ocr = jnp.asarray(rng.randint(0, 256, (ph // 2, pw // 2), np.uint8))
    B16 = (ph // 16) * (pw // 16)
    B32 = (ph // 32) * (pw // 32)
    nctb = g.n_ctbs
    qpv = jnp.asarray(rng.randint(24, 40, (nctb,), np.int32))
    lam = jnp.asarray(2.0 ** ((rng.randint(24, 40, (nctb,)) - 12) / 3.0),
                      jnp.float32)
    modes = jnp.asarray(rng.randint(0, 35, (B16,), np.int32))
    mode32 = jnp.asarray(rng.randint(0, 35, (B32,), np.int32))
    inter_m = jnp.asarray(rng.rand(B16) < 0.7)
    ipy = jnp.asarray(rng.randint(0, 256, (B16, 16, 16), np.int32))
    ipcb = jnp.asarray(rng.randint(0, 256, (B16, 8, 8), np.int32))
    ipcr = jnp.asarray(rng.randint(0, 256, (B16, 8, 8), np.int32))
    m32_in = jnp.asarray(rng.rand(B32) < 0.4)

    fails = 0
    for sign_hide in (True, False):
        for strong in (True,):
            for cfg in ("I", "P"):
                scans = []
                for no_pallas in ("1", ""):
                    os.environ["X265_NO_PALLAS"] = no_pallas
                    scan = CtuScan(g, bit_depth=8, sign_hide=sign_hide,
                                   strong_intra_smoothing=strong,
                                   rdoq=False, noise_reduction=False)
                    if cfg == "I":
                        fn = jax.jit(scan.scan_fn(inter=False,
                                                  decide32=True))
                        out = fn(oy, ocb, ocr, modes, mode32,
                                 jnp.zeros((B32,), bool), qpv, qpv, qpv,
                                 lam)
                    else:
                        fn = jax.jit(scan.scan_fn(inter=True,
                                                  decide32=True))
                        out = fn(oy, ocb, ocr, modes, mode32,
                                 jnp.zeros((B32,), bool), qpv, qpv, qpv,
                                 lam, inter_m, ipy, ipcb, ipcr, m32_in)
                    scans.append(jax.tree.map(
                        lambda x: np.asarray(x) if x is not None else None,
                        out))
                names = ("rec_y rec_cb rec_cr lv16 lv8cb lv8cr lv32 "
                         "lv16cb lv16cr use32 tu8 nr").split()
                for nm, a, b in zip(names, scans[0], scans[1]):
                    if a is None and b is None:
                        continue
                    if not np.array_equal(a, b):
                        d = (np.asarray(a) != np.asarray(b))
                        print("MISMATCH %s/%s sh=%s: %s %d/%d diff"
                              % (cfg, nm, sign_hide, a.shape, d.sum(),
                                 d.size))
                        fails += 1
                if not fails:
                    print("OK %s sign_hide=%s" % (cfg, sign_hide))
    os.environ.pop("X265_NO_PALLAS", None)
    print("FAILED" if fails else "ALL MATCH")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
