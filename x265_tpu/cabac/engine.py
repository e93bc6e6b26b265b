"""CABAC binary arithmetic coding engine (encoder + decoder).

Implements the normative algorithm of ITU-T H.265 §9.3.4 directly
(EncodeDecision/EncodeBypass/EncodeTerminate with PutBit + bitsOutstanding,
and the corresponding DecodeDecision/DecodeBypass/DecodeTerminate).  Same
role as the reference's engines (x265_1.9/source/encoder/entropy.cpp:2187
encodeBin / libde265/libde265/cabac.cc decode_CABAC_bit) but written from
the spec's flowcharts rather than the HM byte-buffered variant — output
bitstreams are identical by construction.

Context state is packed (pStateIdx << 1 | valMps) in a flat numpy array so
WPP context snapshots are O(1) copies and the same state vector can be
shipped to device for vectorized bit estimation.
"""

from __future__ import annotations

import numpy as np

from ..common.bitstream import BitReader, BitWriter
from .tables import LPS_TABLE, NEXT_STATE_LPS, NEXT_STATE_MPS

_LPS = LPS_TABLE  # [64][4] uint8
_NEXT_MPS = NEXT_STATE_MPS
_NEXT_LPS = NEXT_STATE_LPS


class CabacEncoder:
    """H.265 §9.3.4.4 arithmetic encoder writing into a BitWriter."""

    __slots__ = ("bw", "low", "range", "bits_outstanding", "first_bit", "ctx")

    def __init__(self, bw: BitWriter | None = None,
                 ctx: np.ndarray | None = None) -> None:
        self.bw = bw if bw is not None else BitWriter()
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True
        self.ctx = ctx  # packed (state<<1)|mps context array

    # -- low-level bit output ------------------------------------------------

    def _put_bit(self, b: int) -> None:
        if self.first_bit:
            self.first_bit = False
        else:
            self.bw.write(b, 1)
        if self.bits_outstanding:
            inv = 1 - b
            for _ in range(self.bits_outstanding):
                self.bw.write(inv, 1)
            self.bits_outstanding = 0

    def _renorm(self) -> None:
        # RenormE (§9.3.4.4.3): thresholds tested before the left shift
        while self.range < 256:
            if self.low >= 0x200:
                self._put_bit(1)
                self.low -= 0x200
            elif self.low < 0x100:
                self._put_bit(0)
            else:
                self.low -= 0x100
                self.bits_outstanding += 1
            self.range <<= 1
            self.low <<= 1

    # -- bin coding ----------------------------------------------------------

    def encode_bin(self, ctx_idx: int, bin_val: int) -> None:
        packed = int(self.ctx[ctx_idx])
        state = packed >> 1
        mps = packed & 1
        lps = int(_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if bin_val != mps:
            self.low += self.range
            self.range = lps
            if state == 0:
                mps = 1 - mps
            state = int(_NEXT_LPS[state])
        else:
            state = int(_NEXT_MPS[state])
        self.ctx[ctx_idx] = (state << 1) | mps
        self._renorm()

    def encode_bypass(self, bin_val: int) -> None:
        self.low <<= 1
        if bin_val:
            self.low += self.range
        if self.low >= 0x400:
            self._put_bit(1)
            self.low -= 0x400
        elif self.low < 0x200:
            self._put_bit(0)
        else:
            self.low -= 0x200
            self.bits_outstanding += 1

    def encode_bypass_bins(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bypass((value >> i) & 1)

    def encode_terminate(self, bin_val: int) -> None:
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.flush()
        else:
            self._renorm()

    def flush(self) -> None:
        """EncodeFlush (§9.3.4.4.6): drain low; leaves writer bit-unaligned."""
        self.range = 2
        self._renorm()
        self._put_bit((self.low >> 9) & 1)
        self.bw.write(((self.low >> 7) & 3) | 1, 2)

    # -- helpers used by the syntax layer ------------------------------------

    def encode_eg_k(self, value: int, k: int) -> None:
        """k-th order Exp-Golomb, bypass coded (coeff_abs_level_remaining
        suffix, MVD suffix)."""
        while value >= (1 << k):
            self.encode_bypass(1)
            value -= 1 << k
            k += 1
        self.encode_bypass(0)
        self.encode_bypass_bins(value, k)


class CabacDecoder:
    """H.265 §9.3.4.3 arithmetic decoder reading from a BitReader."""

    __slots__ = ("br", "offset", "range", "ctx")

    def __init__(self, br: BitReader, ctx: np.ndarray | None = None) -> None:
        self.br = br
        self.range = 510
        self.offset = br.read(9)
        self.ctx = ctx

    def decode_bin(self, ctx_idx: int) -> int:
        packed = int(self.ctx[ctx_idx])
        state = packed >> 1
        mps = packed & 1
        lps = int(_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                mps = 1 - mps
            state = int(_NEXT_LPS[state])
        else:
            bin_val = mps
            state = int(_NEXT_MPS[state])
        self.ctx[ctx_idx] = (state << 1) | mps
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.br.read(1)
        return bin_val

    def decode_bypass(self) -> int:
        self.offset = (self.offset << 1) | self.br.read(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bins(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.br.read(1)
        return 0

    def decode_eg_k(self, k: int) -> int:
        value = 0
        while self.decode_bypass():
            value += 1 << k
            k += 1
        if k:
            value += self.decode_bypass_bins(k)
        return value
