"""JAX 802.11n HT 2x2 chain: TX vs golden model, RX loopback through MIMO
channels (golden TX -> JAX RX and JAX TX -> JAX RX), batched pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from sora_tpu.golden import dot11n_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import dot11n_common as N
from sora_tpu.phy.dot11n import rx as jrx
from sora_tpu.phy.dot11n import tx as jtx


def _mimo_channel(rng):
    while True:
        H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))) \
            / np.sqrt(2.0)
        if abs(np.linalg.det(H)) > 0.3:
            return H


def _through(H, tx, snr_db=None, rng=None, pad=80):
    y = H @ np.asarray(tx)
    y = np.concatenate([np.zeros((2, pad)), y, np.zeros((2, pad))], axis=1)
    if rng is not None and snr_db is not None:
        p = np.mean(np.abs(y) ** 2)
        sigma = np.sqrt(p / (10 ** (snr_db / 10)) / 2)
        y = y + sigma * (rng.normal(size=y.shape)
                         + 1j * rng.normal(size=y.shape))
    return y.astype(np.complex64)


@pytest.mark.parametrize("mcs", [8, 10, 13])
def test_jax_tx_matches_golden(rng, mcs):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 48,
                                                  dtype=np.uint8)), seq=1)
    ref = g.modulate(psdu, mcs)
    wav = np.asarray(jtx.modulate(
        jnp.asarray(np.frombuffer(psdu, np.uint8))[None], mcs,
        len(psdu)))[0]
    assert wav.shape == ref.shape
    assert np.max(np.abs(wav - ref)) < 2e-3


@pytest.mark.parametrize("mcs", [8, 9, 11, 13, 15])
def test_golden_tx_jax_rx_identity(rng, mcs):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                  dtype=np.uint8)), seq=2)
    y = _through(np.eye(2), g.modulate(psdu, mcs))
    res = jrx.demodulate(y)
    assert res.ok, (mcs, res.reason)
    assert res.mcs == mcs and res.psdu == psdu


@pytest.mark.parametrize("mcs", [8, 12, 14])
def test_random_mimo_channel_with_noise(rng, mcs):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 80,
                                                  dtype=np.uint8)), seq=3)
    H = _mimo_channel(rng)
    y = _through(H, g.modulate(psdu, mcs), snr_db=35, rng=rng)
    res = jrx.demodulate(y, expect_mcs=mcs)
    assert res.ok, (mcs, res.reason)
    assert res.psdu == psdu


def test_jax_tx_jax_rx_loopback(rng):
    mcs = 11
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 64,
                                                  dtype=np.uint8)), seq=4)
    wav = np.asarray(jtx.modulate(
        jnp.asarray(np.frombuffer(psdu, np.uint8))[None], mcs,
        len(psdu)))[0]
    H = _mimo_channel(rng)
    res = jrx.demodulate(_through(H, wav, snr_db=30, rng=rng))
    assert res.ok, res.reason
    assert res.mcs == mcs and res.psdu == psdu


def test_batched_pipeline(rng):
    """The known-MCS batched pipeline: B frames, per-frame channels."""
    mcs, B, Nsamp, plen = 9, 4, 3600, 72
    x = np.zeros((B, 2, Nsamp), np.complex64)
    psdus = []
    for i in range(B):
        psdu = fr.build_data_frame(bytes(rng.integers(0, 256, plen - 28,
                                                      dtype=np.uint8)),
                                   seq=i)
        psdus.append(psdu)
        wav = _through(_mimo_channel(rng), g.modulate(psdu, mcs),
                       snr_db=32, rng=rng, pad=40 + 13 * i)
        x[i, :, :wav.shape[1]] = wav[:, :Nsamp]
    out = jrx.rx_pipeline(jnp.asarray(x), mcs, max_psdu=256)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["mcs"]), np.asarray(out["length"]))
    for i, psdu in enumerate(psdus):
        assert bytes(np.asarray(out["psdu"])[i][: len(psdu)]) == psdu


def test_noise_rejected(rng):
    y = 0.1 * (rng.normal(size=(2, 4000))
               + 1j * rng.normal(size=(2, 4000))).astype(np.complex64)
    res = jrx.demodulate(y)
    assert not res.ok


def test_truncated(rng):
    psdu = fr.build_data_frame(b"x" * 200, seq=5)
    y = _through(np.eye(2), g.modulate(psdu, 8))[:, :1400]
    res = jrx.demodulate(y)
    assert not res.ok


def test_mixed_mcs_batch_auto_dispatch(rng):
    """MCS 8-15 in ONE batch through one jit program — the batched
    TBB11nMRSelect analogue (PHY_11n.hpp:290)."""
    mcss = list(range(8, 16))
    psdus, waves = [], []
    for i, mcs in enumerate(mcss):
        psdu = fr.build_data_frame(bytes(rng.integers(
            0, 256, 40 + 8 * i, dtype=np.uint8)), seq=i)
        psdus.append(psdu)
        H = _mimo_channel(rng)
        waves.append(_through(H, g.modulate(psdu, mcs), snr_db=28,
                              rng=rng, pad=40 + 7 * i))
    N_samp = max(w.shape[1] for w in waves) + 64
    x = np.zeros((len(mcss), 2, N_samp), np.complex64)
    for i, w in enumerate(waves):
        x[i, :, : w.shape[1]] = w
    out = jrx.rx_pipeline_auto(jnp.asarray(x), max_psdu=256)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["mcs"]),
                      np.asarray(out["length"]))
    assert list(np.asarray(out["mcs"])) == mcss
    got = np.asarray(out["psdu"])
    for i, psdu in enumerate(psdus):
        assert bytes(got[i][: len(psdu)]) == psdu


# =============================================================================
# Single-spatial-stream MCS 0-7 (Table 20-30; beyond the reference's
# 2-stream-only MCS 8-10 support)
# =============================================================================


def _chan_2x1(rng):
    while True:
        h = (rng.normal(size=(2, 1)) + 1j * rng.normal(size=(2, 1))
             ) / np.sqrt(2.0)
        if np.abs(h).min() > 0.2:
            return h


@pytest.mark.parametrize("mcs", [0, 3, 5, 7])
def test_1ss_tx_matches_golden(mcs, rng):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 60,
                                                  dtype=np.uint8)), seq=1)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    wj = np.asarray(jtx.modulate(jnp.asarray(arr), mcs, len(psdu)))
    wg = g.modulate(psdu, mcs)
    assert wj.shape == (1,) + wg.shape
    np.testing.assert_allclose(wj[0], wg, atol=2e-3)


@pytest.mark.parametrize("mcs", list(range(8)))
def test_1ss_loopback(mcs, rng):
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 80,
                                                  dtype=np.uint8)), seq=2)
    w = g.modulate(psdu, mcs)                       # (1, n)
    y = _chan_2x1(rng) @ w                          # (2, n)
    x = np.zeros((1, 2, y.shape[1] + 300), np.complex64)
    x[0, :, 50: 50 + y.shape[1]] = y
    cfo = 2 * np.pi * 90e3 / 20e6
    x = x * np.exp(1j * cfo * np.arange(x.shape[-1]))
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = jrx.rx_pipeline_1ss(jnp.asarray(x), mcs, max_psdu=256)
    assert np.asarray(out["ok"])[0], (mcs, np.asarray(out["sig_ok"]),
                                      np.asarray(out["mcs"]))
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu


def test_1ss_auto_mixed_mcs(rng):
    """A batch mixing all eight single-stream MCS decodes in the ONE
    rx_pipeline_auto_1ss jit program."""
    psdus, waves = [], []
    for mcs in range(8):
        p = fr.build_data_frame(bytes(rng.integers(0, 256, 52,
                                                   dtype=np.uint8)),
                                seq=mcs)
        psdus.append(p)
        waves.append(_chan_2x1(rng) @ g.modulate(p, mcs))
    N = max(w.shape[1] for w in waves) + 300
    x = np.zeros((8, 2, N), np.complex64)
    for i, w in enumerate(waves):
        x[i, :, 40: 40 + w.shape[1]] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = jrx.rx_pipeline_auto_1ss(jnp.asarray(x), max_psdu=128)
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["mcs"]))
    assert list(np.asarray(out["mcs"])) == list(range(8))
    got = np.asarray(out["psdu"])
    length = np.asarray(out["length"])
    for i, p in enumerate(psdus):
        assert bytes(got[i][: length[i]]) == p


def test_1ss_demodulate_dispatch(rng):
    """The host wrapper parses HT-SIG and routes MCS 0-7 frames through
    the single-stream path automatically."""
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 90,
                                                  dtype=np.uint8)), seq=4)
    w = g.modulate(psdu, 4)
    y = _chan_2x1(rng) @ w
    x = np.zeros((2, y.shape[1] + 400), np.complex64)
    x[:, 60: 60 + y.shape[1]] = y
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    res = jrx.demodulate(x)
    assert res.ok, res.reason
    assert res.mcs == 4 and res.psdu == psdu


# =============================================================================
# Short guard interval (400 ns, HT-SIG bit 31 — beyond the reference)
# =============================================================================


@pytest.mark.parametrize("mcs", [15, 7])
def test_short_gi_loopback_and_rejection(mcs, rng):
    """SGI frames (72-sample data symbols) decode through the short_gi
    pipelines, the 800 ns pipelines reject them (HT-SIG bit mismatch +
    wrong symbol boundaries), and demodulate routes by the parsed bit."""
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 90,
                                                  dtype=np.uint8)), seq=1)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    wg = g.modulate(psdu, mcs, short_gi=True)
    wj = np.asarray(jtx.modulate(jnp.asarray(arr), mcs, len(psdu),
                                 short_gi=True))
    np.testing.assert_allclose(wj[0], wg, atol=2e-3)
    assert wg.shape[1] < g.modulate(psdu, mcs).shape[1]
    if mcs >= 8:
        while True:
            H = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
                 ) / np.sqrt(2.0)
            if abs(np.linalg.det(H)) > 0.3:
                break
        y = H @ wg
        pipe = jrx.rx_pipeline
    else:
        y = np.array([[0.8 + 0.3j], [0.4 - 0.6j]]) @ wg
        pipe = jrx.rx_pipeline_1ss
    x = np.zeros((1, 2, y.shape[1] + 300), np.complex64)
    x[0, :, 50: 50 + y.shape[1]] = y
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.005
    out = pipe(jnp.asarray(x), mcs, max_psdu=256, short_gi=True)
    assert np.asarray(out["ok"])[0]
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu
    out2 = pipe(jnp.asarray(x), mcs, max_psdu=256)
    assert not np.asarray(out2["ok"])[0]
    res = jrx.demodulate(x[0])
    assert res.ok and res.mcs == mcs and res.psdu == psdu
