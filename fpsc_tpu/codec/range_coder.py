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


class AdaptiveFreqTable:
    """Adaptive frequency model: counts update after every coded
    symbol (identically on both sides, so no tables are transmitted).
    Rescales by halving when the total passes `limit` to track
    non-stationary streams."""

    def __init__(self, n: int, increment: int = 24, limit: int = 1 << 12):
        self.counts = np.ones(n, np.int64)
        self.increment = increment
        self.limit = limit
        self._rebuild()

    def _rebuild(self):
        self.freq = self.counts
        self.cum = np.concatenate([[0], np.cumsum(self.counts)])
        self.total = int(self.cum[-1])

    def find(self, value: int) -> int:
        return int(np.searchsorted(self.cum, value, side="right") - 1)

    def update(self, sym: int):
        self.counts[sym] += self.increment
        if self.counts.sum() > self.limit:
            self.counts = np.maximum(1, self.counts >> 1)
        self._rebuild()


# --------------------------------------------------------------------------
# Self-contained entropy-coded utterance format (pitch included)
# --------------------------------------------------------------------------
#
# Round-1's fixed-layout bitstream spent 11 bits/frame (1100 b/s, ~45%
# of the stream) on the pitch side-channel.  Here every stream is
# range-coded with ADAPTIVE models (both sides update identically, so
# no side information is transmitted): the period code as a delta with
# escape (voiced pitch moves by 0..2 codes per 10 ms), the 3-bit corr
# code, the two indicator bits, and all codebook indices.  Static
# usage-derived tables (from training-set counts) can override the
# index models via `static_models`.

_PITCH_DELTA_RANGE = 32            # deltas in [-32, 31]; else escape
_PITCH_ESCAPE = 2 * _PITCH_DELTA_RANGE            # symbol 64


def _utterance_models(sizes: Dict, static_models: Dict = None) -> Dict:
    # indicators and the corr code are strongly temporally correlated:
    # condition each on its previous symbol (one adaptive table per
    # context), worth ~100 b/s over the order-0 models
    m = {
        "ind1": [AdaptiveFreqTable(2) for _ in range(2)],
        "ind2": [AdaptiveFreqTable(2) for _ in range(2)],
        "scl": AdaptiveFreqTable(sizes["scl"]),
        "pitch_abs": FreqTable(np.ones(256)),
        "pitch_delta": AdaptiveFreqTable(_PITCH_ESCAPE + 1),
        "corr": [AdaptiveFreqTable(8) for _ in range(8)],
    }
    if sizes.get("scl_bl"):
        m["scl_bl"] = AdaptiveFreqTable(sizes["scl_bl"])
    for s, e in enumerate(sizes["vq"]):
        m[f"vq_{s}"] = AdaptiveFreqTable(e)
    for s, e in enumerate(sizes.get("vq_bl", [])):
        m[f"vq_bl_{s}"] = AdaptiveFreqTable(e)
    if static_models:
        m.update(static_models)
    return m


def _code_adaptive(coder, table, sym: int, decode: bool) -> int:
    if decode:
        sym = coder.decode(table)
    else:
        coder.encode(table, int(sym))
    if isinstance(table, AdaptiveFreqTable):
        table.update(int(sym))
    return int(sym)


def pack_utterance_rc(ind1, ind2, indices: Dict, pcodes,
                      sizes: Dict, static_models: Dict = None) -> bytes:
    """Entropy-coded counterpart of bitstream.pack_utterance.

    pcodes: (L, 2) int codes from bitstream.quantize_pitch (RAW-scale
    pitch).  Returns a self-contained payload: 2-byte length header +
    range-coded body; the decoder rebuilds the identical adaptive
    models, so nothing else is transmitted."""
    models = _utterance_models(sizes, static_models)
    enc = RangeEncoder()
    ind1 = np.asarray(ind1).astype(int)
    ind2 = np.asarray(ind2).astype(int)
    iscl = np.asarray(indices["scl"])
    iscl_bl = np.asarray(indices["scl_bl"])
    ivq = np.atleast_2d(np.asarray(indices["vq"]))
    ivq_bl = np.atleast_2d(np.asarray(indices["vq_bl"]))
    pcodes = np.asarray(pcodes)
    length = len(ind1)
    prev_p, prev_c, prev_i1, prev_i2 = 0, 0, 0, 0
    for t in range(length):
        _code_adaptive(enc, models["ind1"][prev_i1], ind1[t], False)
        _code_adaptive(enc, models["ind2"][prev_i2], ind2[t], False)
        prev_i1, prev_i2 = int(ind1[t]), int(ind2[t])
        p = int(pcodes[t, 0])
        if t == 0:
            enc.encode(models["pitch_abs"], p)
        else:
            d = p - prev_p
            if -_PITCH_DELTA_RANGE <= d < _PITCH_DELTA_RANGE:
                _code_adaptive(enc, models["pitch_delta"],
                               d + _PITCH_DELTA_RANGE, False)
            else:
                _code_adaptive(enc, models["pitch_delta"],
                               _PITCH_ESCAPE, False)
                enc.encode(models["pitch_abs"], p)
        prev_p = p
        c = int(pcodes[t, 1])
        _code_adaptive(enc, models["corr"][prev_c], c, False)
        prev_c = c
        if ind1[t]:
            _code_adaptive(enc, models["scl"], int(iscl[t]), False)
        elif "scl_bl" in models:
            _code_adaptive(enc, models["scl_bl"], int(iscl_bl[t]), False)
        if ind2[t]:
            for s in range(len(sizes["vq"])):
                _code_adaptive(enc, models[f"vq_{s}"], int(ivq[t, s]),
                               False)
        else:
            for s in range(len(sizes.get("vq_bl", []))):
                _code_adaptive(enc, models[f"vq_bl_{s}"],
                               int(ivq_bl[t, s]), False)
    body = enc.finish()
    return int(length).to_bytes(2, "big") + body


def unpack_utterance_rc(data: bytes, sizes: Dict,
                        static_models: Dict = None) -> Dict:
    """Inverse of pack_utterance_rc; returns the bitstream.
    unpack_utterance dict layout (ind1, ind2, indices, pitch)."""
    from fpsc_tpu.codec.bitstream import dequantize_pitch

    length = int.from_bytes(data[:2], "big")
    models = _utterance_models(sizes, static_models)
    dec = RangeDecoder(data[2:])
    n_vq = len(sizes["vq"])
    n_vq_bl = len(sizes.get("vq_bl", []))
    ind1 = np.zeros(length, bool)
    ind2 = np.zeros(length, bool)
    iscl = np.full(length, -1, np.int32)
    iscl_bl = np.full(length, -1, np.int32)
    ivq = np.full((length, max(n_vq, 1)), -1, np.int32)
    ivq_bl = np.full((length, max(n_vq_bl, 1)), -1, np.int32)
    pcodes = np.zeros((length, 2), np.int64)
    prev_p, prev_c, prev_i1, prev_i2 = 0, 0, 0, 0
    for t in range(length):
        ind1[t] = bool(_code_adaptive(dec, models["ind1"][prev_i1],
                                      0, True))
        ind2[t] = bool(_code_adaptive(dec, models["ind2"][prev_i2],
                                      0, True))
        prev_i1, prev_i2 = int(ind1[t]), int(ind2[t])
        if t == 0:
            p = dec.decode(models["pitch_abs"])
        else:
            sym = _code_adaptive(dec, models["pitch_delta"], 0, True)
            if sym == _PITCH_ESCAPE:
                p = dec.decode(models["pitch_abs"])
            else:
                p = prev_p + sym - _PITCH_DELTA_RANGE
        pcodes[t, 0] = p
        prev_p = p
        pcodes[t, 1] = _code_adaptive(dec, models["corr"][prev_c],
                                      0, True)
        prev_c = int(pcodes[t, 1])
        if ind1[t]:
            iscl[t] = _code_adaptive(dec, models["scl"], 0, True)
        elif "scl_bl" in models:
            iscl_bl[t] = _code_adaptive(dec, models["scl_bl"], 0, True)
        if ind2[t]:
            for s in range(n_vq):
                ivq[t, s] = _code_adaptive(dec, models[f"vq_{s}"], 0,
                                           True)
        else:
            for s in range(n_vq_bl):
                ivq_bl[t, s] = _code_adaptive(dec, models[f"vq_bl_{s}"],
                                              0, True)
    return {"ind1": ind1, "ind2": ind2,
            "indices": {"scl": iscl, "scl_bl": iscl_bl,
                        "vq": ivq, "vq_bl": ivq_bl},
            "pitch": dequantize_pitch(pcodes)}


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
