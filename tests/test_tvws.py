"""TV-whitespace channelized front end + multi-channel decode
(umxistanbul analogue, /root/reference/kernel/bb/umxistanbul/)."""

import numpy as np

from sora_tpu.apps import tvws


def test_channelize_recovers_shifted_frame(rng):
    import jax.numpy as jnp
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac import frame as fr
    from sora_tpu.phy import frontend as fe
    from sora_tpu.phy.dot11a import rx as jrx

    psdu = fr.build_data_frame(b"tv whitespace channel", seq=1)
    w = g.modulate(psdu, 12).astype(np.complex64)
    w40 = np.asarray(fe.upsample2(jnp.asarray(w[None]))[0])
    f = 8e6 / 40e6
    osc = np.exp(2j * np.pi * f * np.arange(len(w40))).astype(np.complex64)
    x = np.concatenate([np.zeros(300, np.complex64), w40 * osc,
                        np.zeros(300, np.complex64)])
    x += (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x))
          ).astype(np.complex64) * 0.01
    ch = np.asarray(fe.channelize(jnp.asarray(x[None]), f, decim=2))
    res = jrx.demodulate(ch[0])
    assert res.ok and res.psdu == psdu, res.reason


def test_tvws_band_decode(rng):
    # two spectrally disjoint 20 MHz channels inside the 40 Msps band
    offs = [-10e6, 10e6]
    x, n_tx = tvws.synth_band(6, offs, 40e6)
    frames = tvws.decode_band(x, offs, 40e6)
    assert len(frames) == 6, [f["channel_hz"] for f in frames]
    chans = [f["channel_hz"] for f in frames]
    for ch in offs:
        assert chans.count(ch) == 3
