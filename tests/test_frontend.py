"""In-chain sample-rate front end: 40 Msps OFDM path, 44/40 Msps DSSS
paths, pulse shaping, resamplers (SURVEY items: samples.hpp, sampling.hpp,
pulse.hpp, dc.hpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sora_tpu.golden import dot11a_np as g
from sora_tpu.mac import frame as fr
from sora_tpu.phy import frontend as fe
from sora_tpu.phy.dot11a import rx as arx
from sora_tpu.phy.dot11b import rx as brx
from sora_tpu.phy.dot11b import tx as btx


def _psdu(rng, n=80, seq=1):
    return fr.build_data_frame(bytes(rng.integers(0, 256, n - 28,
                                                  dtype=np.uint8)), seq=seq)


def test_dc_remove_and_decimate_roundtrip(rng):
    x = (rng.normal(size=(2, 4096)) + 1j * rng.normal(size=(2, 4096))
         ).astype(np.complex64)
    y = fe.ofdm_frontend_40m(jnp.asarray(x + (3.0 - 2.0j)))
    got = np.asarray(y)
    assert got.shape == (2, 2048)
    assert abs(got.mean()) < 0.05                  # DC gone


def test_ofdm_40m_loopback(rng):
    """TX at 20 Msps -> halfband interpolate to 40 Msps -> add DC offset +
    noise -> full RX with the on-device front end."""
    psdu = _psdu(rng, seq=3)
    wave = g.modulate(psdu, 24).astype(np.complex64)
    x20 = np.concatenate([np.zeros(64), wave, np.zeros(64)]).astype(
        np.complex64)
    x40 = np.asarray(fe.upsample2(jnp.asarray(x20[None, :])))[0]
    x40 = x40 + (0.21 - 0.13j)                     # hardware DC offset
    x40 += (rng.normal(size=len(x40)) + 1j * rng.normal(size=len(x40))
            ).astype(np.complex64) * 0.02
    res = arx.demodulate(x40, input_rate="40m")
    assert res.ok, res.reason
    assert res.psdu == psdu


def test_ofdm_40m_batched_pipeline(rng):
    psdu = _psdu(rng, seq=4)
    wave = g.modulate(psdu, 12).astype(np.complex64)
    B, N40 = 3, 8192
    x40 = np.zeros((B, N40), np.complex64)
    w40 = np.asarray(fe.upsample2(jnp.asarray(wave[None, :])))[0]
    for i in range(B):
        off = 100 + 57 * i
        x40[i, off: off + len(w40)] = w40
    x40 += 0.1 + 0.05j
    x40 += (rng.normal(size=x40.shape) + 1j * rng.normal(size=x40.shape)
            ).astype(np.complex64) * 0.02
    out = arx.rx_pipeline(jnp.asarray(x40), 12, max_psdu=128,
                          input_rate="40m")
    assert np.asarray(out["ok"]).all()
    got = np.asarray(out["psdu"])
    for i in range(B):
        assert bytes(got[i][: len(psdu)]) == psdu


@pytest.mark.parametrize("rate", [1, 2, 5.5, 11])
def test_dsss_44msps_interop_loopback(rate, rng):
    """11b chips -> RRC pulse shape @44 Msps -> matched filter + phase
    select -> chips -> decode (TPulseShaper/TMatchFilter/TSymTiming path)."""
    psdu = _psdu(rng, n=44, seq=5)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    chips = np.asarray(btx.modulate(jnp.asarray(arr), rate, len(psdu)))[0]
    pad = np.zeros(33, np.complex64)
    tx_chips = np.concatenate([pad, chips, pad]).astype(np.complex64)
    x44 = np.asarray(fe.pulse_shape_11b(jnp.asarray(tx_chips[None, :])))[0]
    x44 = x44 + (0.05 - 0.02j)
    x44 += (rng.normal(size=len(x44)) + 1j * rng.normal(size=len(x44))
            ).astype(np.complex64) * 0.01
    rx_chips = np.asarray(fe.chip_frontend_44m(jnp.asarray(x44[None, :])))
    res = brx.demodulate(rx_chips[0])
    assert res.ok, (rate, res.reason)
    assert res.psdu == psdu
    assert res.rate_mbps == rate


def test_dsss_40msps_resample_path(rng):
    """Commercial-NIC interop direction: 44 Msps waveform observed by a
    40 Msps radio -> 11/10 resample + matched filter -> decode."""
    psdu = _psdu(rng, n=40, seq=6)
    arr = np.frombuffer(psdu, np.uint8)[None, :]
    chips = np.asarray(btx.modulate(jnp.asarray(arr), 2, len(psdu)))[0]
    pad = np.zeros(33, np.complex64)
    tx_chips = np.concatenate([pad, chips, pad]).astype(np.complex64)
    x44 = np.asarray(fe.pulse_shape_11b(jnp.asarray(tx_chips[None, :])))[0]
    x40 = np.array(fe.resample(jnp.asarray(x44[None, :]), 10, 11))[0]
    x40 += (rng.normal(size=len(x40)) + 1j * rng.normal(size=len(x40))
            ).astype(np.complex64) * 0.01
    rx_chips = np.asarray(fe.chip_frontend_40m(jnp.asarray(x40[None, :])))
    res = brx.demodulate(rx_chips[0])
    assert res.ok, res.reason
    assert res.psdu == psdu


def test_resample_roundtrip_tone():
    """A baseband tone survives 40 -> 44 -> 40 resampling."""
    n = 2048
    t = np.arange(n)
    x = np.exp(2j * np.pi * 0.03 * t).astype(np.complex64)[None, :]
    y = fe.resample(jnp.asarray(x), 11, 10)
    z = np.asarray(fe.resample(y, 10, 11))[0]
    m = min(len(z), n)
    # ignore filter edges
    sl = slice(256, m - 256)
    err = np.abs(z[sl] - x[0, sl])
    assert np.median(err) < 0.05


def test_54mbps_golden_dump_roundtrip(tmp_path, rng):
    """Generate a 54 Mbps (64-QAM) capture in the RCB 14-bit dump format
    at 40 Msps, then decode it through the raw path — extends the capture
    corpus beyond the checked-in 6 Mbps fixture (SURVEY §4 item 1)."""
    from sora_tpu.io.dumpfile import load_dump, save_dump

    psdu = _psdu(rng, n=300, seq=9)
    wave = g.modulate(psdu, 54).astype(np.complex64)
    x20 = np.concatenate([np.zeros(80), wave, np.zeros(80)]).astype(
        np.complex64)
    x40 = np.asarray(fe.upsample2(jnp.asarray(x20[None, :])))[0]
    # scale into the 14-bit ADC range and add a DC offset like real HW
    x40 = x40 * (2200.0 / np.abs(x40).max()) + (60.0 - 35.0j)
    path = str(tmp_path / "fsample54.dmp")
    save_dump(path, x40, bits=14)
    raw = load_dump(path)                    # 14-bit sign-extend
    res = arx.demodulate(raw, input_rate="40m")
    assert res.ok, res.reason
    assert res.rate_mbps == 54
    assert res.psdu == psdu


def test_ofdm_44msps_interop_all_rates(rng):
    """The 11a commercial-NIC interop mode: TX staged at 44 Msps
    (TUpsample40MTo44M, fb11amod_config.hpp:114-118), RX through the
    44->40->20 front end (CreateDemodGraph11a_44M,
    fb11ademod_config.hpp:221) — every rate decodes via
    input_rate="44m"."""
    rates = sorted(arx.C.RATES)
    psdus, waves = [], []
    for i, r in enumerate(rates):
        p = _psdu(rng, n=80, seq=i)
        psdus.append(p)
        w20 = np.concatenate([np.zeros(40), g.modulate(p, r),
                              np.zeros(40)]).astype(np.complex64)
        waves.append(np.asarray(fe.ofdm_upsample_44m(
            jnp.asarray(w20[None])))[0])
    N = max(len(w) for w in waves) + 200
    x = np.zeros((len(rates), N), np.complex64)
    for i, w in enumerate(waves):
        x[i, 50: 50 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    out = arx.rx_pipeline_auto(jnp.asarray(x), max_psdu=128,
                               input_rate="44m")
    ok = np.asarray(out["ok"])
    assert ok.all(), (ok, np.asarray(out["rate_mbps"]))
    assert list(np.asarray(out["rate_mbps"])) == rates
    got = np.asarray(out["psdu"])
    for i, p in enumerate(psdus):
        assert bytes(got[i][: len(p)]) == p


def test_ofdm_44msps_demodulate_single(rng):
    psdu = _psdu(rng, n=120, seq=3)
    w20 = np.concatenate([np.zeros(64), g.modulate(psdu, 24),
                          np.zeros(64)]).astype(np.complex64)
    w44 = np.asarray(fe.ofdm_upsample_44m(jnp.asarray(w20[None])))[0]
    res = arx.demodulate(w44, input_rate="44m")
    assert res.ok, res.reason
    assert res.rate_mbps == 24 and res.psdu == psdu


def test_ofdm_44msps_11n_node_front(rng):
    """2x2 HT frames at the 44 Msps input rate through the node's OFDM
    front-end dispatch (phy 'n', input_rate='44m')."""
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.phy.dot11n import rx as nrx

    psdu = _psdu(rng, n=90, seq=5)
    w20 = np.asarray(gn.modulate(psdu, 10))          # (2, n)
    w44 = np.asarray(fe.ofdm_upsample_44m(jnp.asarray(
        np.pad(w20, ((0, 0), (50, 50))).astype(np.complex64))))
    x = w44[None] + (rng.normal(size=(1,) + w44.shape)
                     + 1j * rng.normal(size=(1,) + w44.shape)
                     ).astype(np.complex64) * 0.01
    x20 = fe.ofdm_frontend(jnp.asarray(x.reshape(2, -1)),
                           "44m").reshape(1, 2, -1)
    out = nrx.rx_pipeline(x20, 10, max_psdu=128)
    assert np.asarray(out["ok"])[0], np.asarray(out["mcs"])
    n = int(np.asarray(out["length"])[0])
    assert bytes(np.asarray(out["psdu"])[0][:n]) == psdu
