"""Loopback sensitivity vs SNR (SURVEY §4.2: mod -> AWGN -> demod BER/CRC
sweeps): each rate decodes at its expected operating SNR with margin, and
fails cleanly (no crash, fcs_ok False) far below it."""

import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy.dot11a import rx as jrx


def _run(rate, snr_db, rng, n=6):
    import jax.numpy as jnp

    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [g.modulate(p, rate).astype(np.complex64) for p in psdus]
    N = max(len(w) for w in waves) + 300
    x = np.zeros((n, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 40: 40 + len(w)] = w
    sig_p = float(np.mean([np.mean(np.abs(w) ** 2) for w in waves]))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr_db / 10.0)))
    x += sigma * (rng.normal(size=x.shape)
                  + 1j * rng.normal(size=x.shape)).astype(np.complex64)
    out = jrx.rx_pipeline(jnp.asarray(x), rate, max_psdu=128)
    return int(np.asarray(out["ok"]).sum()), n


@pytest.mark.parametrize("rate,snr_ok,snr_fail", [
    (6, 10.0, -6.0),      # BPSK 1/2: decodes near ~5 dB
    (12, 13.0, -3.0),     # QPSK 1/2
    (54, 30.0, 8.0),      # 64-QAM 3/4: needs ~25 dB
])
def test_sensitivity_thresholds(rate, snr_ok, snr_fail, rng):
    ok, n = _run(rate, snr_ok, rng)
    assert ok == n, f"{rate} Mbps at {snr_ok} dB: {ok}/{n}"
    ok, n = _run(rate, snr_fail, rng)
    assert ok == 0, f"{rate} Mbps at {snr_fail} dB should fail: {ok}/{n}"


def _run_b(rate, preamble, snr_db, rng, n=6):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11b_np as gb
    from sora_tpu.phy.dot11b import rx as brx

    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [gb.modulate(p, rate, preamble=preamble).astype(np.complex64)
             for p in psdus]
    N = max(len(w) for w in waves) + 400
    x = np.zeros((n, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 50: 50 + len(w)] = w
    sig_p = float(np.mean([np.mean(np.abs(w) ** 2) for w in waves]))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr_db / 10.0)))
    x += sigma * (rng.normal(size=x.shape)
                  + 1j * rng.normal(size=x.shape)).astype(np.complex64)
    out = brx.rx_pipeline_auto(jnp.asarray(x), max_psdu=len(psdus[0]))
    return int(np.asarray(out["ok"]).sum()), n


@pytest.mark.parametrize("rate,preamble,snr_ok,snr_fail", [
    (1, "long", 4.0, -14.0),     # Barker DBPSK: most robust mode
    (11, "long", 12.0, -4.0),    # CCK-11: ~8 dB operating point
    (11, "short", 12.0, -4.0),   # short preamble tracks its sibling
])
def test_sensitivity_thresholds_11b(rate, preamble, snr_ok, snr_fail,
                                    rng):
    ok, n = _run_b(rate, preamble, snr_ok, rng)
    assert ok == n, f"11b {rate}/{preamble} at {snr_ok} dB: {ok}/{n}"
    ok, n = _run_b(rate, preamble, snr_fail, rng)
    assert ok == 0, f"11b {rate}/{preamble} at {snr_fail} dB: {ok}/{n}"


def _run_n(mcs, snr_db, rng, n=6):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx

    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 40,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [np.asarray(gn.modulate(p, mcs)) for p in psdus]
    N = max(w.shape[1] for w in waves) + 300
    x = np.zeros((n, 2, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, :, 40: 40 + w.shape[1]] = w
    sig_p = float(np.mean([np.mean(np.abs(w) ** 2) for w in waves]))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr_db / 10.0)))
    x += sigma * (rng.normal(size=x.shape)
                  + 1j * rng.normal(size=x.shape)).astype(np.complex64)
    out = nrx.rx_pipeline(jnp.asarray(x), mcs, max_psdu=128)
    return int(np.asarray(out["ok"]).sum()), n


@pytest.mark.parametrize("mcs,snr_ok,snr_fail", [
    (8, 10.0, -8.0),      # BPSK 1/2 x2 streams
    (15, 32.0, 10.0),     # 64-QAM 3/4 x2: ~27 dB operating point
])
def test_sensitivity_thresholds_11n(mcs, snr_ok, snr_fail, rng):
    ok, n = _run_n(mcs, snr_ok, rng)
    assert ok == n, f"MCS {mcs} at {snr_ok} dB: {ok}/{n}"
    ok, n = _run_n(mcs, snr_fail, rng)
    assert ok == 0, f"MCS {mcs} at {snr_fail} dB: {ok}/{n}"


def test_11n_weighted_mmse_beats_plain_zf_under_multipath(rng):
    """The MMSE + per-subcarrier LLR-weighted 2x2 receiver must clearly
    beat the reference's equal-weight plain-ZF detector
    (channel_11n.hpp:426-445) under frequency-selective Rayleigh
    multipath at MCS 15 — measured ~+3 dB (19/32 vs 7/32 at 30 dB,
    tools/sensitivity_sweep.py sweep_11n_mixed)."""
    import jax.numpy as jnp

    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx

    n, mcs, snr = 24, 15, 30.0
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 72,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [np.asarray(gn.modulate(p, mcs)) for p in psdus]
    N = max(w.shape[1] for w in waves) + 320
    x = np.zeros((n, 2, N), np.complex64)
    ch = np.random.default_rng(77)
    for i, w in enumerate(waves):
        m = np.zeros((2, w.shape[1] + 12), np.complex64)
        for delay, p in zip((0, 3, 7, 12), (1.0, 0.5, 0.25, 0.12)):
            H = (ch.normal(size=(2, 2)) + 1j * ch.normal(size=(2, 2))
                 ).astype(np.complex64) * np.sqrt(p / 2.0)
            m[:, delay: delay + w.shape[1]] += H @ w
        x[i, :, 40: 40 + m.shape[1]] = m
    sig_p = float(np.mean(np.abs(x) ** 2) * N / (N - 320))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr / 10.0)))
    rng_n = np.random.default_rng(130)
    xn = jnp.asarray(x + sigma * (
        rng_n.normal(size=x.shape) + 1j * rng_n.normal(size=x.shape)
    ).astype(np.complex64))
    ours = int(np.asarray(nrx.rx_pipeline(
        xn, mcs, max_psdu=128)["ok"]).sum())
    ref = int(np.asarray(nrx.rx_pipeline(
        xn, mcs, max_psdu=128, mmse=False, weighted=False)["ok"]).sum())
    assert ours >= ref + 5, (ours, ref, n)


def test_11n_1ss_mrc_llr_weighting_helps_under_multipath():
    """Single-stream SIMO: weighting soft bits by the per-subcarrier MRC
    gain (sum_a |H_ak|^2) beats equal-weight demap on a
    frequency-selective channel (12 vs 8 of 24 frames at 21 dB with
    these seeds) — crushed subcarriers become near-erasures."""
    import jax.numpy as jnp

    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx

    n, mcs, snr = 24, 7, 21.0
    rng = np.random.default_rng(5)
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 72,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [np.asarray(gn.modulate(p, mcs))[0] for p in psdus]
    N = max(len(v) for v in waves) + 320
    x = np.zeros((n, 2, N), np.complex64)
    ch = np.random.default_rng(31)
    for i, v in enumerate(waves):
        for a in range(2):
            y = np.zeros(len(v) + 12, np.complex128)
            for d, p in zip((0, 3, 7, 12), (1.0, 0.5, 0.25, 0.12)):
                h = (ch.normal() + 1j * ch.normal()) * np.sqrt(p / 2)
                y[d: d + len(v)] += h * v
            x[i, a, 40: 40 + len(y)] = y
    sig_p = float(np.mean(np.abs(x) ** 2) * N / (N - 320))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr / 10.0)))
    rng_n = np.random.default_rng(121)
    xn = jnp.asarray(x + sigma * (
        rng_n.normal(size=x.shape) + 1j * rng_n.normal(size=x.shape)
    ).astype(np.complex64))
    lts1, cfo, det = nrx.synchronize(xn)
    nsym = nrx.max_symbols(mcs, 128)
    _, xd, _, wgt = nrx.extract_symbols_1ss(xn, lts1, cfo, nsym, False,
                                            return_weights=True)
    L = jnp.full((n,), len(psdus[0]), jnp.int32)
    _, fw = nrx.decode_data_1ss(xd, L, mcs, 128, wgt)
    _, fu = nrx.decode_data_1ss(xd, L, mcs, 128)
    ours, ref = int(np.asarray(fw).sum()), int(np.asarray(fu).sum())
    assert ours >= ref + 3, (ours, ref)


def test_11a_subcarrier_llr_weighting_helps_under_multipath():
    """The 11a decode tail weights soft bits by per-subcarrier |H_k|^2
    (the ZF output's inverse noise amplification): under a 4-tap in-CP
    channel this decodes 12 vs 8 of 24 54 Mbps frames at 24 dB with
    these seeds — information the reference's equal-weight demap LUTs
    (dsp_demap.h) discard."""
    import jax.numpy as jnp

    n, rate, snr = 24, 54, 24.0
    rng = np.random.default_rng(8)
    psdus = [fr.build_data_frame(bytes(rng.integers(0, 256, 72,
                                                    dtype=np.uint8)),
                                 seq=i) for i in range(n)]
    waves = [g.modulate(p, rate) for p in psdus]
    N = max(len(w) for w in waves) + 320
    x = np.zeros((n, N), np.complex64)
    ch = np.random.default_rng(44)
    for i, w in enumerate(waves):
        y = np.zeros(len(w) + 12, np.complex128)
        for d, p in zip((0, 3, 7, 12), (1.0, 0.5, 0.25, 0.12)):
            h = (ch.normal() + 1j * ch.normal()) * np.sqrt(p / 2)
            y[d: d + len(w)] += h * w
        x[i, 40: 40 + len(y)] = y
    sig_p = float(np.mean(np.abs(x) ** 2) * N / (N - 320))
    sigma = np.sqrt(sig_p / (2.0 * 10 ** (snr / 10.0)))
    rng_n = np.random.default_rng(224)
    xn = jnp.asarray(x + sigma * (
        rng_n.normal(size=x.shape) + 1j * rng_n.normal(size=x.shape)
    ).astype(np.complex64))
    lts1, cfo, det = jrx.synchronize(xn)
    nsym = jrx.max_symbols(jrx.C.RATES[rate], 128)
    eq, _, wgt = jrx.extract_symbols(xn, lts1, cfo, nsym,
                                     return_weights=True)
    L = jnp.full((n,), len(psdus[0]), jnp.int32)
    _, fw, _ = jrx.decode_data(eq[:, 1:, :], L, rate, wgt)
    _, fu, _ = jrx.decode_data(eq[:, 1:, :], L, rate)
    ours, ref = int(np.asarray(fw).sum()), int(np.asarray(fu).sum())
    assert ours >= ref + 3, (ours, ref)
