"""Deterministic property sweep: random (rate/MCS, length, format)
loopbacks across all three PHYs in batched programs.

Length-edge bugs (odd byte counts, minimum frames, symbol-boundary
fits, the 11 Mbps length-extension service bit) are the classic PHY
failure mode; the targeted tests pin one length each, this sweeps many
under fixed seeds.  One compile per PHY (shared max_psdu / window), so
the whole sweep stays cheap.
"""

import numpy as np
import pytest

from sora_tpu.mac.frame import append_fcs


def _psdu(rng, n):
    # arbitrary MAC-ish bytes + valid FCS; n = total PSDU length >= 5
    return append_fcs(bytes(rng.integers(0, 256, n - 4, dtype=np.uint8)))


def test_fuzz_11a_lengths_and_rates(rng):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.phy import common as C
    from sora_tpu.phy.dot11a import rx as jrx

    rates = sorted(C.RATES)
    n = 24
    lens = [5, 6, 7, 14, 29, 63, 64, 65, 127, 255, 256, 400] + \
        list(rng.integers(5, 600, n - 12))
    psdus, waves, used = [], [], []
    for i in range(n):
        r = rates[int(rng.integers(0, 8))]
        p = _psdu(rng, int(lens[i]))
        psdus.append(p)
        used.append(r)
        waves.append(g.modulate(p, r).astype(np.complex64))
    N = max(len(w) for w in waves) + 300
    x = np.zeros((n, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 40 + int(rng.integers(0, 90)):][: len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=600)
    ok = np.asarray(out["ok"])
    got_r = np.asarray(out["rate_mbps"])
    got_l = np.asarray(out["length"])
    psdu_out = np.asarray(out["psdu"])
    bad = [(i, used[i], len(psdus[i])) for i in range(n) if not ok[i]]
    assert not bad, bad
    for i in range(n):
        assert got_r[i] == used[i] and got_l[i] == len(psdus[i])
        assert bytes(psdu_out[i][: got_l[i]]) == psdus[i], (i, used[i])


def test_fuzz_11b_lengths_rates_preambles(rng):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11b_np as gb
    from sora_tpu.phy.dot11b import rx as brx

    combos = []
    for i in range(16):
        rate = [1, 2, 5.5, 11][int(rng.integers(0, 4))]
        pre = "short" if (rate != 1 and rng.integers(0, 2)) else "long"
        # odd AND even lengths; 11 Mbps exercises the length-extension bit
        ln = int(rng.integers(5, 220))
        combos.append((rate, pre, ln))
    combos += [(11, "long", 5), (11, "short", 137), (5.5, "long", 6),
               (2, "short", 7), (1, "long", 5)]
    psdus, waves = [], []
    for rate, pre, ln in combos:
        p = _psdu(rng, ln)
        psdus.append(p)
        waves.append(gb.modulate(p, rate, preamble=pre).astype(
            np.complex64))
    n = len(combos)
    N = max(len(w) for w in waves) + 400
    x = np.zeros((n, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 50 + int(rng.integers(0, 60)):][: len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = brx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256)
    ok = np.asarray(out["ok"])
    got_l = np.asarray(out["length"])
    psdu_out = np.asarray(out["psdu"])
    bad = [(i, combos[i]) for i in range(n) if not ok[i]]
    assert not bad, bad
    for i in range(n):
        assert got_l[i] == len(psdus[i]), (i, combos[i], got_l[i])
        assert bytes(psdu_out[i][: got_l[i]]) == psdus[i], (i, combos[i])


def test_fuzz_11n_lengths_both_stream_classes(rng):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx

    def chan(nss):
        while True:
            h = (rng.normal(size=(2, nss)) + 1j * rng.normal(size=(2, nss))
                 ) / np.sqrt(2.0)
            if nss == 1 and np.abs(h).min() > 0.25:
                return h
            if nss == 2 and abs(np.linalg.det(h)) > 0.3:
                return h

    for mcs_pool, pipe in (([8, 9, 10, 11, 12, 13, 14, 15],
                            nrx.rx_pipeline_auto),
                           ([0, 1, 2, 3, 4, 5, 6, 7],
                            nrx.rx_pipeline_auto_1ss)):
        combos = [(mcs_pool[int(rng.integers(0, 8))],
                   int(rng.integers(5, 320))) for _ in range(10)]
        combos += [(mcs_pool[0], 5), (mcs_pool[-1], 319)]
        psdus, ys = [], []
        for mcs, ln in combos:
            p = _psdu(rng, ln)
            psdus.append(p)
            w = np.asarray(gn.modulate(p, mcs))
            ys.append(chan(w.shape[0]) @ w)
        n = len(combos)
        N = max(y.shape[1] for y in ys) + 300
        x = np.zeros((n, 2, N), np.complex64)
        for i, y in enumerate(ys):
            off = 40 + int(rng.integers(0, 60))
            x[i, :, off: off + y.shape[1]] = y
        x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
              ).astype(np.complex64) * 0.008
        out = pipe(jnp.asarray(x), max_psdu=384)
        ok = np.asarray(out["ok"])
        got_m = np.asarray(out["mcs"])
        got_l = np.asarray(out["length"])
        psdu_out = np.asarray(out["psdu"])
        bad = [(i, combos[i]) for i in range(n) if not ok[i]]
        assert not bad, bad
        for i, (mcs, ln) in enumerate(combos):
            assert got_m[i] == mcs and got_l[i] == ln
            assert bytes(psdu_out[i][:ln]) == psdus[i], (i, mcs, ln)


def test_fuzz_garbage_never_crashes(rng):
    """Random byte soup / pathological inputs through every public
    demodulate: sane reasons, no exceptions, never ok."""
    from sora_tpu.phy.dot11a import rx as arx
    from sora_tpu.phy.dot11b import rx as brx
    from sora_tpu.phy.dot11n import rx as nrx

    cases = [
        (rng.normal(size=5000) + 1j * rng.normal(size=5000)).astype(
            np.complex64) * 3.0,
        np.zeros(5000, np.complex64),
        np.ones(5000, np.complex64) * (1 + 1j),
        np.exp(2j * np.pi * 0.1 * np.arange(5000)).astype(np.complex64),
    ]
    for x in cases:
        ra = arx.demodulate(x)
        assert not ra.ok and isinstance(ra.reason, str)
        rb = brx.demodulate(x)
        assert not rb.ok
        rn = nrx.demodulate(np.stack([x, x]))
        assert not rn.ok
