"""Minimal FLAC *encoder* used as the test oracle for native/flacio.cpp.

Writes spec-conformant streams from the decoder's subset: STREAMINFO,
fixed-blocksize frames, CONSTANT / VERBATIM / FIXED / LPC subframes,
partitioned rice residuals (partition order 0), all four stereo channel
assignments, correct CRC-8/CRC-16 and UTF-8 coded frame numbers. Being an
independent implementation of the bit format, agreement between this writer
and the C++ reader is evidence both match the spec.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1 if nbits < 64 else (1 << 64) - 1
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes_.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        while self.nbits:
            self.write(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes_)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def write_utf8_num(bw: BitWriter, n: int) -> None:
    if n < 0x80:
        bw.write(n, 8)
        return
    # multi-byte form
    for extra, lead, cap in [(1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16),
                             (3, 0xF0, 1 << 21), (4, 0xF8, 1 << 26),
                             (5, 0xFC, 1 << 31)]:
        if n < cap:
            shift = 6 * extra
            bw.write(lead | (n >> shift), 8)
            for i in range(extra - 1, -1, -1):
                bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def write_rice(bw: BitWriter, v: int, k: int) -> None:
    u = (v << 1) if v >= 0 else (-(v + 1) << 1) | 1  # zig-zag
    q, r = u >> k, u & ((1 << k) - 1)
    for _ in range(q):
        bw.write(0, 1)
    bw.write(1, 1)
    if k:
        bw.write(r, k)


def _best_rice_k(res: Sequence[int]) -> int:
    best_k, best_bits = 0, None
    for k in range(15):
        bits = 0
        for v in res:
            u = (v << 1) if v >= 0 else (-(v + 1) << 1) | 1
            bits += (u >> k) + 1 + k
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bw: BitWriter, sig: np.ndarray, bps: int, kind: str,
                    lpc_coefs: Optional[List[int]] = None,
                    lpc_shift: int = 5, fixed_order: int = 2) -> None:
    sig = [int(v) for v in sig]
    n = len(sig)
    bw.write(0, 1)  # padding
    if kind == "constant":
        assert all(v == sig[0] for v in sig)
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(sig[0] & ((1 << bps) - 1), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in sig:
            bw.write(v & ((1 << bps) - 1), bps)
    elif kind == "fixed":
        order = fixed_order
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in sig[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        coefs = FIXED_COEFS[order]
        res = [
            sig[i] - sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        _write_residual(bw, res)
    elif kind == "lpc":
        coefs = lpc_coefs or [3, -2]
        order = len(coefs)
        prec = 6
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in sig[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        bw.write(prec - 1, 4)
        bw.write(lpc_shift & 0x1F, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        res = []
        for i in range(order, n):
            acc = sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
            res.append(sig[i] - (acc >> lpc_shift))
        _write_residual(bw, res)
    else:
        raise ValueError(kind)


def _write_residual(bw: BitWriter, res: List[int]) -> None:
    bw.write(0, 2)  # 4-bit rice method
    bw.write(0, 4)  # partition order 0
    k = _best_rice_k(res)
    bw.write(k, 4)
    for v in res:
        write_rice(bw, v, k)


def write_flac(
    path,
    channels: List[np.ndarray],  # int arrays, one per channel
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 256,
    subframe_kind: str = "fixed",
    stereo_mode: str = "independent",  # independent|left_side|right_side|mid_side
    lpc_coefs: Optional[List[int]] = None,
) -> None:
    nch = len(channels)
    n_total = len(channels[0])
    assert all(len(c) == n_total for c in channels)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.data()
    out += bytes([0x80, 0, 0, len(body)]) + body

    frame_idx = 0
    for start in range(0, n_total, block_size):
        blk = [c[start : start + block_size] for c in channels]
        bs = len(blk[0])
        fw = BitWriter()
        fw.write(0x3FFE, 14)
        fw.write(0, 1)
        fw.write(0, 1)  # fixed blocksize strategy
        fw.write(7, 4)  # 16-bit blocksize-1 follows
        fw.write(0, 4)  # sample rate from STREAMINFO
        if nch == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            code = nch - 1
        fw.write(code, 4)
        fw.write(0, 3)  # sample size from STREAMINFO
        fw.write(0, 1)
        write_utf8_num(fw, frame_idx)
        fw.write(bs - 1, 16)
        header = fw.data() if fw.nbits == 0 else None
        assert header is not None  # all fields above are byte-aligned
        fw.write(crc8(header), 8)

        subs = []
        if nch == 2 and stereo_mode == "left_side":
            subs = [(blk[0], bps), (blk[0].astype(np.int64) - blk[1], bps + 1)]
        elif nch == 2 and stereo_mode == "right_side":
            subs = [(blk[0].astype(np.int64) - blk[1], bps + 1), (blk[1], bps)]
        elif nch == 2 and stereo_mode == "mid_side":
            l = blk[0].astype(np.int64)
            r = blk[1].astype(np.int64)
            subs = [((l + r) >> 1, bps), (l - r, bps + 1)]
        else:
            subs = [(c, bps) for c in blk]
        for sig, sub_bps in subs:
            _write_subframe(fw, sig, sub_bps, subframe_kind, lpc_coefs=lpc_coefs)
        fw.align()
        frame_wo_crc = fw.data()
        fw.write(crc16(frame_wo_crc), 16)
        out += fw.data()
        frame_idx += 1

    with open(path, "wb") as fh:
        fh.write(bytes(out))
