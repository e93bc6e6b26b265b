"""CTU-level wavefront scan (encoder/ctu_scan.py) equivalence tests.

The CTU scan must reproduce the round-1 16x16-block wavefront output
bit-exactly (same modes, same QPs -> same recon planes and levels)."""

import numpy as np
import pytest

from x265_tpu.common.params import Params
from x265_tpu.encoder import Encoder
from x265_tpu.encoder.ctu_scan import CtuScan


def _frames(w, h, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (h + 8, w + 8)).astype(np.uint8)
    y = base[:h, :w] + rng.integers(0, 40, (h, w)).astype(np.uint8)
    cb = rng.integers(60, 190, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(60, 190, (h // 2, w // 2)).astype(np.uint8)
    return (y, cb, cr)


@pytest.mark.parametrize("w,h", [(64, 64), (96, 64), (128, 128)])
@pytest.mark.parametrize("sign_hide", [False, True])
def test_ctu_scan_matches_block_wavefront_i(w, h, sign_hide):
    p = Params(bframes=0, source_width=w, source_height=h, qp=30, sao=False,
               deblock=False, sign_hide=sign_hide,
               aq_mode=0)              # uniform QP (scan fed one QP below)
    enc = Encoder(p)
    enc.force_cu16 = True      # compare against the fixed-16 configuration
    frame = _frames(w, h)
    au, rec_old = enc.encode_frame(frame)
    ps = enc.last_ps

    g = enc.geom
    ph = g.ctbs_h << g.log2_ctb
    pw = g.ctbs_w << g.log2_ctb
    from x265_tpu.encoder.intra_encoder import pad_plane
    oy = pad_plane(np.asarray(frame[0]), ph, pw)
    ocb = pad_plane(np.asarray(frame[1]), ph // 2, pw // 2)
    ocr = pad_plane(np.asarray(frame[2]), ph // 2, pw // 2)

    modes16 = ps.luma_mode[::4, ::4].astype(np.int32).reshape(-1)
    scan = CtuScan(g, bit_depth=8, sign_hide=sign_hide)
    B32 = scan.t["b32_n"]
    run = scan.scan_fn(inter=False)
    qp = np.full(g.n_ctbs, enc.qp, np.int32)
    from x265_tpu.cabac.ctu import chroma_qp
    qpc = np.full(g.n_ctbs, chroma_qp(enc.qp), np.int32)
    out = run(oy, ocb, ocr, modes16, np.zeros(B32, np.int32),
              np.zeros(B32, bool), qp, qpc, qpc)
    rec_y, rec_cb, rec_cr, lv16_y, lv8_cb, lv8_cr = [
        np.asarray(x) if x is not None else None for x in out[:6]]

    cw, ch = enc.sps.pic_width, enc.sps.pic_height
    assert np.array_equal(rec_y[:ch, :cw], rec_old[0])
    assert np.array_equal(rec_cb[:ch // 2, :cw // 2], rec_old[1])
    assert np.array_equal(rec_cr[:ch // 2, :cw // 2], rec_old[2])

    # levels -> coeff planes must match the encoder's PicSyntax coeffs
    gh16, gw16 = ph // 16, pw // 16
    cy = lv16_y.reshape(gh16, gw16, 16, 16).transpose(0, 2, 1, 3).reshape(
        ph, pw)
    assert np.array_equal(cy[:ch, :cw].astype(np.int32),
                          ps.coeff_y[:ch, :cw])
    ccb = lv8_cb.reshape(gh16, gw16, 8, 8).transpose(0, 2, 1, 3).reshape(
        ph // 2, pw // 2)
    assert np.array_equal(ccb[:ch // 2, :cw // 2].astype(np.int32),
                          ps.coeff_cb[:ch // 2, :cw // 2])
    ccr = lv8_cr.reshape(gh16, gw16, 8, 8).transpose(0, 2, 1, 3).reshape(
        ph // 2, pw // 2)
    assert np.array_equal(ccr[:ch // 2, :cw // 2].astype(np.int32),
                          ps.coeff_cr[:ch // 2, :cw // 2])


def _smooth_frame(w, h, seed=5):
    """Smooth gradients + a textured band: drives mixed 32/16 decisions."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (40 + xx * 160 // max(1, w) + yy * 30 // max(1, h)).astype(np.uint8)
    y[h // 4:h // 2] += rng.integers(0, 60, (h // 2 - h // 4, w),
                                     dtype=np.uint8)
    cb = (128 + xx[::2, ::2] // 8).astype(np.uint8)
    cr = (128 - yy[::2, ::2] // 8).astype(np.uint8)
    return (y, cb, cr)


@pytest.mark.parametrize("w,h", [(128, 64), (96, 96)])
def test_cu32_decision_roundtrip(w, h):
    """The in-scan 32-vs-16 RD decision must pick some 32 CUs on smooth
    content and the stream must decode bit-exact in our decoder."""
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.encoder import encode_sequence

    p = Params(bframes=0, source_width=w, source_height=h, qp=32,
               decoded_picture_hash=1)
    frame = _smooth_frame(w, h)
    stream, recons = encode_sequence([frame], p)
    enc_ps = None
    pics = decode_annexb(stream)
    assert len(pics) == 1 and pics[0].hash_ok
    assert np.array_equal(pics[0].planes[0], recons[0][0])
    # smooth content at ctu>=32 must produce at least one 32x32 CU
    enc_ps = pics[0].syntax
    d32 = 6 - 5  # log2_ctb 6 -> depth 1
    assert (enc_ps.depth[:h // 4, :w // 4] == d32).any(), \
        "no 32x32 CUs chosen on smooth content"


def test_cu32_decision_roundtrip_p_frames():
    """32-CU decision in P frames (intra quadrants only) stays conformant."""
    from x265_tpu.decoder import decode_annexb
    from x265_tpu.encoder import encode_sequence

    w, h = 128, 64
    base = _smooth_frame(w, h)
    rng = np.random.default_rng(9)
    frames = [base]
    for t in range(2):
        y = np.roll(base[0], 2 * (t + 1), axis=1)
        # scene-change band forces intra CUs inside the P frame
        y[:, :32] = rng.integers(0, 255, (h, 32), dtype=np.uint8)
        frames.append((y, base[1], base[2]))
    p = Params(bframes=0, source_width=w, source_height=h, qp=32,
               decoded_picture_hash=1, scenecut_threshold=0)
    stream, recons = encode_sequence(frames, p)
    pics = decode_annexb(stream)
    assert len(pics) == 3
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok
        assert np.array_equal(pic.planes[0], rec[0])
