"""802.11 scrambler (x^7+x^4+1) — JAX, vectorized.

The reference drives a byte-LUT scrambler brick through the stream
(kernel/bb/Brick11/src/scramble.hpp:9-355).  The sequence is 127-periodic,
so the TPU formulation is: tabulate all 127 cyclic phases once (a
(127, 127) uint8 constant), gather the row for the seed's phase, and tile.
Seed -> phase is a 127-entry LUT built at import time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sora_tpu.phy import common as C

# The scrambler state cycles through all 127 nonzero seeds; the output
# sequence for any seed is a rotation of the canonical (all-ones) period.
_PERIOD = C.scrambler_sequence(127, 0x7F).astype(np.uint8)

# phase[seed] = offset o such that scrambler_sequence(n, seed) ==
# roll(period, -o)[:n]
_PHASE = np.zeros(128, dtype=np.int64)
for _seed in range(1, 128):
    first7 = C.scrambler_sequence(7, _seed)
    for _o in range(127):
        if np.array_equal(np.roll(_PERIOD, -_o)[:7], first7):
            _PHASE[_seed] = _o
            break

_PHASES_TABLE = np.stack([np.roll(_PERIOD, -o) for o in range(127)])
# kept as numpy so traced uses embed them as program constants
_PHASES_J = _PHASES_TABLE
_PHASE_J = _PHASE


def sequence(n: int, seed) -> jnp.ndarray:
    """First n scrambler output bits for a (traced or static) 7-bit seed."""
    row = jnp.asarray(_PHASES_J)[jnp.asarray(_PHASE_J)[seed]]
    reps = -(-n // 127)
    return jnp.tile(row, reps)[:n]


def seed_from_prefix(prefix7: jnp.ndarray) -> jnp.ndarray:
    """Recover the seed whose first 7 outputs are prefix7 (traced uint8[7]).

    Used by the RX frame sink: the SERVICE field starts with 7 zero bits,
    so the first 7 descrambler inputs are the raw sequence.  Matches the
    canonical period against all 127 phases and maps phase -> seed.
    """
    # find phase whose first 7 bits match
    match = jnp.all(jnp.asarray(_PHASES_J[:, :7]) == prefix7[None, :],
                    axis=1)
    phase = jnp.argmax(match)
    # invert _PHASE: seed_of_phase[o]
    inv = np.zeros(127, dtype=np.int64)
    inv[_PHASE[1:]] = np.arange(1, 128)
    return jnp.asarray(inv)[phase]
