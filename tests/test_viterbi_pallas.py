"""Pallas Viterbi kernel vs the XLA reference decoder (interpret mode)."""

import numpy as np
import pytest

from sora_tpu.dsp import viterbi as dvit
from sora_tpu.golden import dot11a_np as g
from sora_tpu.ops import viterbi_pallas as vp


def test_pallas_matches_xla_blocks(rng):
    bits = rng.integers(0, 2, (3, 1500)).astype(np.uint8)
    bits[:, -6:] = 0
    coded = np.stack([g.conv_encode(b) for b in bits])
    soft = ((2.0 * coded - 1.0)
            + rng.normal(size=coded.shape) * 0.4).astype(np.float32)
    sab = soft.reshape(3, 1500, 2)
    want = np.asarray(dvit.decode(sab, terminated=True))
    got = np.asarray(vp.decode_blocks(sab, block=256, overlap=96, bt=8,
                                      interpret=True))
    assert np.array_equal(got, want)
    assert np.array_equal(got, bits)


def test_pallas_single_block(rng):
    bits = rng.integers(0, 2, (1, 200)).astype(np.uint8)
    coded = np.stack([g.conv_encode(b) for b in bits])
    soft = (2.0 * coded - 1.0).astype(np.float32).reshape(1, 200, 2)
    got = np.asarray(vp.decode_blocks(soft, block=256, overlap=64, bt=8,
                                      interpret=True))
    assert np.array_equal(got, bits)
