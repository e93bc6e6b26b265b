"""Rate control: CQP / CRF / ABR.

Role parity with x265's RateControl (x265_1.9/source/encoder/
ratecontrol.cpp:1061 rateControlStart / :2317 rateControlEnd), as the host
scalar state machine between device frame steps (SURVEY.md §7 design
stance).  This v1 implements:

  * CQP  — constant QP, with the I-frame offset from ipratio,
  * CRF  — constant rate factor: fixed quality target mapped to QP
           (complexity-adaptive qComp weighting arrives with the lookahead),
  * ABR  — average bitrate via multiplicative feedback on the accumulated
           bits-vs-target error (the core of x265's
           tuneAbrQScaleFromFeedback, without VBV).

2-pass, VBV and cu-tree arrive with the lookahead subsystem.
"""

from __future__ import annotations

import math


def qp_to_qscale(qp: float) -> float:
    return 0.85 * 2.0 ** ((qp - 12.0) / 6.0)


def qscale_to_qp(qs: float) -> float:
    return 12.0 + 6.0 * math.log2(qs / 0.85)


class RateControl:
    def __init__(self, params):
        from ..common.params import RC_ABR, RC_CQP, RC_CRF
        self.p = params
        self.fps = params.fps_num / max(1, params.fps_denom)
        self.mode = {RC_CQP: "cqp", RC_CRF: "crf",
                     RC_ABR: "abr"}[params.rc_mode]
        if self.mode == "abr" and params.bitrate <= 0:
            self.mode = "cqp"
        # I frames get a lower QP by ~6*log2(ipratio) (x265 ipratio default)
        ip = getattr(params, "ip_factor", 1.4) or 1.4
        self.ip_offset = max(0, round(6.0 * math.log2(ip)))
        self.frame = 0
        self.bits_acc = 0.0
        self.qp_prev = float(params.qp)
        if self.mode == "abr":
            self.target_bps = params.bitrate * 1000.0
            self.target_per_frame = self.target_bps / self.fps
            # bootstrap QP from bits-per-pixel (x265 ABR init heuristic)
            bpp = self.target_per_frame / max(
                1, params.source_width * params.source_height)
            qs = 0.9 / max(bpp, 1e-4) ** 0.6 * 0.3
            self.qp_prev = min(48.0, max(10.0, qscale_to_qp(qs)))

    def frame_qp(self, is_intra: bool) -> int:
        if self.mode == "cqp":
            q = self.p.qp
        elif self.mode == "crf":
            q = self.p.crf
        else:  # abr
            q = self.qp_prev
            if self.frame > 0:
                # multiplicative feedback on accumulated error
                expected = self.target_per_frame * self.frame
                ratio = self.bits_acc / max(1.0, expected)
                q = qscale_to_qp(qp_to_qscale(self.qp_prev)
                                 * min(4.0, max(0.25, ratio)) ** 0.5)
                q = min(self.qp_prev + self.p.qp_step,
                        max(self.qp_prev - self.p.qp_step, q))
        q = float(q)
        if is_intra:
            q -= self.ip_offset
        return int(min(51, max(0, round(q))))

    def update(self, bits: int, qp_used: int, is_intra: bool) -> None:
        self.bits_acc += bits
        self.frame += 1
        if self.mode == "abr":
            self.qp_prev = float(qp_used + (self.ip_offset if is_intra
                                            else 0))
