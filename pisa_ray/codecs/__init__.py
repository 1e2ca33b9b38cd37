"""Block codec registry.

A codec is a pair of pure functions ``encode(np.uint32[:]) -> bytes`` /
``decode(bytes, n) -> np.uint32[:]`` applied per posting-list block inside
``map_groups`` / ``map_batches``; payloads live in Arrow ``binary`` columns.

Mirrors the reference's extension surface (struct with
``block_size``/``encode``/``decode``, registered by name —
``/root/reference/include/pisa/index_types.hpp:25-54``).  The default
"bitpack" codec is a SIMD-BP128-style fixed-width bit packing (1 width byte
+ packed bits per block of ≤128 ints), numpy-vectorized; "varbyte" is a
TightVariableByte-style fallback.  Framing conventions (docid gaps stored as
``gap-1``, frequencies as ``tf-1``, 128-int blocks, per-block last-docid +
byte endpoint) follow ``/root/reference/include/pisa/block_posting_list.hpp:12-78``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from pisa_ray.codecs.bitpack import bitpack_encode, bitpack_decode
from pisa_ray.codecs.varbyte import varbyte_encode, varbyte_decode
from pisa_ray.codecs.ef import ef_encode, ef_decode
from pisa_ray.codecs.svb import svb_encode, svb_decode
from pisa_ray.codecs.s8b import s8b_encode, s8b_decode
from pisa_ray.codecs.pfor import pfor_encode, pfor_decode
from pisa_ray.codecs.pef import (pef_encode, pef_decode,
                                 pefopt_encode, pefopt_decode)
from pisa_ray.codecs.bic import bic_encode, bic_decode
from pisa_ray.codecs.mvb import mvb_encode, mvb_decode
from pisa_ray.codecs.vgb import vgb_encode, vgb_decode
from pisa_ray.codecs.s16 import s16_encode, s16_decode
from pisa_ray.codecs.qmx import qmx_encode, qmx_decode

Encoder = Callable[[np.ndarray], bytes]
Decoder = Callable[[bytes, int], np.ndarray]

CODECS: Dict[str, Tuple[Encoder, Decoder]] = {
    "bitpack": (bitpack_encode, bitpack_decode),
    "varbyte": (varbyte_encode, varbyte_decode),
    "ef": (ef_encode, ef_decode),
    "streamvbyte": (svb_encode, svb_decode),
    "simple8b": (s8b_encode, s8b_decode),
    "optpfor": (pfor_encode, pfor_decode),
    "pefuniform": (pef_encode, pef_decode),
    "pefopt": (pefopt_encode, pefopt_decode),
    "interpolative": (bic_encode, bic_decode),
    "maskedvbyte": (mvb_encode, mvb_decode),
    "varintgb": (vgb_encode, vgb_decode),
    "simple16": (s16_encode, s16_decode),
    "qmx": (qmx_encode, qmx_decode),
}

# VarintG8IU (reference codec/VarIntG8IU.h) is deliberately absent: the
# format is patent-encumbered (US 2012/0221539, noted in the reference
# header itself) and is a byte-group layout variant of varintgb.  See
# COVERAGE.md §2.11.

# Monotone codecs encode the ascending values directly (docids; prefix-sum
# freqs) instead of gap-1 deltas — the reference's bitvector index family
# (include/pisa/freq_index.hpp:29-121) vs its block family.
MONOTONE_CODECS = frozenset({"ef", "pefuniform", "pefopt",
                             "interpolative"})

BLOCK_SIZE = 128  # ints per block, reference default (codec/simdbp.hpp:13)


def get_codec(name: str) -> Tuple[Encoder, Decoder]:
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; have {sorted(CODECS)}") from None


__all__ = ["CODECS", "BLOCK_SIZE", "MONOTONE_CODECS", "get_codec",
           "bitpack_encode", "bitpack_decode", "varbyte_encode",
           "varbyte_decode", "ef_encode", "ef_decode"]
