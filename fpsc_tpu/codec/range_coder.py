"""Range (arithmetic) coder for entropy-coded codec bitstreams.

The reference only *measures* codebook usage entropies
(generate_qtz_features.py:94-101,202); this module realises that rate:
a classic carry-less 32-bit range coder with static frequency tables
derived from codebook usage counts.  With well-matched tables the
stream lands within a few percent of the empirical entropy, below the
fixed-width packing of fpsc_tpu.codec.bitstream.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

_TOP = 1 << 24
_BOT = 1 << 16


class FreqTable:
    """Static cumulative-frequency model over `n` symbols."""

    def __init__(self, counts: Sequence[float]):
        c = np.asarray(counts, np.float64) + 1.0  # add-one smoothing
        scaled = np.maximum(1, np.round(
            c / c.sum() * (_BOT - len(c)))).astype(np.int64)
        self.freq = scaled
        self.cum = np.concatenate([[0], np.cumsum(scaled)])
        self.total = int(self.cum[-1])

    def find(self, value: int) -> int:
        return int(np.searchsorted(self.cum, value, side="right") - 1)


class RangeEncoder:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.out = bytearray()

    def encode(self, table: FreqTable, sym: int):
        r = self.range // table.total
        self.low = (self.low + r * int(table.cum[sym])) & 0xFFFFFFFFFFFF
        self.range = r * int(table.freq[sym])
        self._normalize()

    def encode_bit(self, table: FreqTable, bit: int):
        self.encode(table, int(bit))

    def _normalize(self):
        while True:
            if (self.low ^ (self.low + self.range)) < _TOP:
                pass
            elif self.range < _BOT:
                self.range = (-self.low) & (_BOT - 1)
                if self.range == 0:
                    self.range = _BOT
            else:
                break
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
            self.range = (self.range << 8) & 0xFFFFFFFF

    def finish(self) -> bytes:
        for _ in range(4):
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.low = 0
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(4):
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF

    def _byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode(self, table: FreqTable) -> int:
        r = self.range // table.total
        value = min((self.code - self.low) // r, table.total - 1)
        sym = table.find(value)
        self.low = (self.low + r * int(table.cum[sym])) & 0xFFFFFFFFFFFF
        self.range = r * int(table.freq[sym])
        self._normalize()
        return sym

    def _normalize(self):
        while True:
            if (self.low ^ (self.low + self.range)) < _TOP:
                pass
            elif self.range < _BOT:
                self.range = (-self.low) & (_BOT - 1)
                if self.range == 0:
                    self.range = _BOT
            else:
                break
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
            self.low = (self.low << 8) & 0xFFFFFFFF
            self.range = (self.range << 8) & 0xFFFFFFFF


def build_models(counts: Dict) -> Dict:
    """Codebook usage counts (fp.usage_counts layout, plus indicator
    counts) -> frequency tables keyed by symbol stream."""
    return {k: FreqTable(v) for k, v in counts.items()}


def entropy_pack(ind1, ind2, indices: Dict, models: Dict) -> bytes:
    """Entropy-code one utterance's symbol streams.

    models keys: 'ind1', 'ind2' (2-symbol), 'scl', 'scl_bl',
    'vq_0'.., 'vq_bl_0'..  Pitch is NOT included here (pack it with
    bitstream.quantize_pitch or a dedicated model).
    """
    enc = RangeEncoder()
    ind1 = np.asarray(ind1).astype(int)
    ind2 = np.asarray(ind2).astype(int)
    iscl = np.asarray(indices["scl"])
    iscl_bl = np.asarray(indices["scl_bl"])
    ivq = np.atleast_2d(np.asarray(indices["vq"]))
    ivq_bl = np.atleast_2d(np.asarray(indices["vq_bl"]))
    length = len(ind1)
    for t in range(length):
        enc.encode(models["ind1"], ind1[t])
        enc.encode(models["ind2"], ind2[t])
        if ind1[t]:
            enc.encode(models["scl"], int(iscl[t]))
        elif "scl_bl" in models:
            enc.encode(models["scl_bl"], int(iscl_bl[t]))
        if ind2[t]:
            for s in range(ivq.shape[1]):
                enc.encode(models[f"vq_{s}"], int(ivq[t, s]))
        else:
            for s in range(ivq_bl.shape[1]):
                if f"vq_bl_{s}" in models:
                    enc.encode(models[f"vq_bl_{s}"], int(ivq_bl[t, s]))
    return enc.finish()


def entropy_unpack(data: bytes, length: int, models: Dict,
                   n_vq: int, n_vq_bl: int) -> Dict:
    dec = RangeDecoder(data)
    ind1 = np.zeros(length, bool)
    ind2 = np.zeros(length, bool)
    iscl = np.full(length, -1, np.int32)
    iscl_bl = np.full(length, -1, np.int32)
    ivq = np.full((length, n_vq), -1, np.int32)
    ivq_bl = np.full((length, max(n_vq_bl, 1)), -1, np.int32)
    for t in range(length):
        ind1[t] = bool(dec.decode(models["ind1"]))
        ind2[t] = bool(dec.decode(models["ind2"]))
        if ind1[t]:
            iscl[t] = dec.decode(models["scl"])
        elif "scl_bl" in models:
            iscl_bl[t] = dec.decode(models["scl_bl"])
        if ind2[t]:
            for s in range(n_vq):
                ivq[t, s] = dec.decode(models[f"vq_{s}"])
        else:
            for s in range(n_vq_bl):
                if f"vq_bl_{s}" in models:
                    ivq_bl[t, s] = dec.decode(models[f"vq_bl_{s}"])
    return {"ind1": ind1, "ind2": ind2,
            "indices": {"scl": iscl, "scl_bl": iscl_bl,
                        "vq": ivq, "vq_bl": ivq_bl}}
