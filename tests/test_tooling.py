"""Observability + verification tooling: trace channels (DbgPlot
analogue), MacStopwatch real-time profiler, HwVeri measurements."""

import numpy as np
import pytest

from sora_tpu.util import hwveri
from sora_tpu.util.stopwatch import MacStopwatch
from sora_tpu.util.trace import TraceReader, TraceWriter


def test_trace_roundtrip(tmp_path):
    p = str(tmp_path / "t.dbg")
    w = TraceWriter(p, {
        "snr": ("line", 4, 8),
        "const": ("dots", 6, 4),
        "spec": ("spectrum", 16, 2),
        "mac": ("text", 0, 4)})
    for i in range(3):
        w.plot_line("snr", [i, i + 1, i + 2, i + 3])
    w.plot_dots("const", np.arange(6) * (1 + 1j))
    w.plot_spectrum("spec", np.linspace(-90, 0, 16))
    w.log("mac", "frame ok rate=54")
    r = TraceReader(p)
    snr = r.read("snr")
    assert snr.shape == (3, 4) and snr[2, 0] == 2.0
    dots = r.read("const")
    assert dots.dtype == np.complex64 and dots[0, 5] == 5 + 5j
    assert r.read("mac") == ["frame ok rate=54"]
    assert r.kind("const") == "dots"
    w.close(); r.close()


def test_trace_ring_wraps(tmp_path):
    p = str(tmp_path / "t.dbg")
    w = TraceWriter(p, {"v": ("line", 1, 4)})
    for i in range(10):
        w.plot_line("v", [float(i)])
    r = TraceReader(p)
    got = r.read("v")[:, 0].tolist()
    assert got == [6.0, 7.0, 8.0, 9.0]     # last `capacity`, oldest first
    w.close(); r.close()


def test_trace_live_attach(tmp_path):
    """Reader attached before later writes still sees them (the
    out-of-process viewer pattern)."""
    p = str(tmp_path / "t.dbg")
    w = TraceWriter(p, {"v": ("line", 1, 8)})
    w.plot_line("v", [1.0])
    r = TraceReader(p)
    assert r.read("v").shape == (1, 1)
    w.plot_line("v", [2.0])
    assert r.read("v").shape == (2, 1)
    w.close(); r.close()


def test_stopwatch_ratios():
    sw = MacStopwatch(sample_rate=20e6)
    sw.add(20000, 0.0005)      # 1 ms of signal in 0.5 ms -> ratio 0.5
    sw.add(20000, 0.002)       # ratio 2.0
    rep = sw.report()
    assert rep.segments == 2
    assert rep.avg_ratio == pytest.approx(1.25)
    assert rep.max_ratio == pytest.approx(2.0)
    assert rep.frac_over == pytest.approx(0.5)
    assert not rep.realtime
    assert "50.0% segments over" in str(rep)


def test_stopwatch_context():
    sw = MacStopwatch(sample_rate=20e6)
    with sw.segment(200000):
        pass
    assert sw.report().avg_ratio < 1.0


def _tone(fs, f, n, amp=0.5, snr_db=None, rng=None):
    t = np.arange(n) / fs
    x = amp * np.exp(2j * np.pi * f * t)
    if snr_db is not None:
        sigma = amp / np.sqrt(2 * 10 ** (snr_db / 10))
        x = x + sigma * (rng.normal(size=n) + 1j * rng.normal(size=n))
    return x


def test_sine_wave_test(rng):
    x = _tone(20e6, 1.25e6, 8192, snr_db=40, rng=rng) + 0.1
    rep = hwveri.sine_wave_test(x, 20e6)
    assert rep.ok
    assert rep.freq_hz == pytest.approx(1.25e6, rel=1e-3)
    assert abs(rep.dc - 0.1) < 0.01
    assert rep.amplitude == pytest.approx(0.5, rel=0.1)


def test_snr_test(rng):
    x = _tone(20e6, 3e6, 16384, snr_db=25, rng=rng)
    snr = hwveri.snr_test(x, 20e6)
    assert 20 < snr < 30


def test_freq_offset(rng):
    fs, f_nom, off = 20e6, 2e6, 3125.0
    x = _tone(fs, f_nom + off, 65536, snr_db=35, rng=rng)
    got = hwveri.measure_freq_offset(x, fs, f_nom)
    assert got == pytest.approx(off, abs=20.0)


def test_agc(rng):
    x = _tone(20e6, 1e6, 4096, amp=0.01, snr_db=30, rng=rng)
    r = hwveri.agc_select_gain(x, target_rms=0.25)
    assert r.gain >= 16 and not r.clipped
    loud = _tone(20e6, 1e6, 4096, amp=0.9)
    r2 = hwveri.agc_select_gain(loud)
    assert r2.gain == 1.0


def test_render_sparkline_and_chart():
    from sora_tpu.util.render import chart, constellation, sparkline

    v = np.sin(np.linspace(0, 6.28, 200))
    s = sparkline(v, width=40)
    assert len(s) == 40
    c = chart(v, width=40, height=6)
    assert len(c.splitlines()) == 6
    pts = np.asarray([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j] * 32,
                     np.complex64)
    g = constellation(pts, width=24, height=12)
    assert "pts" in g


def test_speanalyzer_tone(tmp_path, capsys):
    from sora_tpu.apps import speanalyzer

    rc = speanalyzer.main(["--tone", "3.2e6", "--msps", "20",
                           "--trace", str(tmp_path / "t.trace")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "+3.2" in out          # peak found at the tone frequency
    assert "spectrum written" in out


def test_plotview_renders_trace(tmp_path, capsys):
    from sora_tpu.apps import plotview
    from sora_tpu.util.trace import TraceWriter

    path = str(tmp_path / "v.trace")
    tw = TraceWriter(path, {"snr": ("line", 64, 16),
                            "const": ("dots", 48, 8),
                            "mac": ("text", 0, 8)})
    tw.plot_line("snr", np.linspace(0, 20, 64))
    tw.plot_dots("const", np.asarray([1 + 1j, -1 - 1j] * 24, np.complex64))
    tw.log("mac", "frame_ok len=1392")
    tw.close()
    rc = plotview.main([path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "== snr [line] ==" in out
    assert "frame_ok len=1392" in out


def test_layered_config(tmp_path, monkeypatch):
    """defaults < file < env < overrides (util/config.py — the
    framework-level replacement for the reference's per-app option
    tables, kernel/util/args/args.c)."""
    from sora_tpu.runtime.node import NodeConfig
    from sora_tpu.util.config import dump_config, load_config

    f = tmp_path / "node.json"
    f.write_text('{"window": 2048, "batch": 4, "ack_rate": 12, '
                 '"max_psdu": 64, "min_rate_mbps": 24}')
    monkeypatch.setenv("SORA_BATCH", "16")
    cfg = load_config(NodeConfig, path=str(f),
                      overrides={"ack_rate": 24, "window": None})
    assert cfg.window == 2048          # file layer
    assert cfg.batch == 16             # env beats file
    assert cfg.ack_rate == 24          # override beats env+file
    assert cfg.phy == "a"              # dataclass default survives
    # round-trip through JSON keeps bytes fields
    import json
    d = json.loads(dump_config(cfg))
    assert d["window"] == 2048

    import pytest as _pytest
    with _pytest.raises(KeyError):
        load_config(NodeConfig, overrides={"nonsense": 1})


def test_demod11_cli_roundtrip(tmp_path, capsys):
    """mod -> dump -> demod through the CLI harness, golden and jax
    chains, incl. the raw-40Msps on-device front-end path."""
    from sora_tpu.apps import demod11

    out = str(tmp_path / "w.dmp")
    assert demod11.main(["--std", "11a", "--mode", "mod", "--rate", "12",
                         "--payload", "cli roundtrip", "--outfile", out,
                         ]) == 0
    assert demod11.main(["--std", "11a", "--mode", "demod", "--chain",
                         "golden", "--infile", out, "--msps", "20"]) == 0
    assert demod11.main(["--std", "11a", "--mode", "demod", "--chain",
                         "jax", "--infile", out, "--msps", "20"]) == 0
    text = capsys.readouterr().out
    assert text.count("frame_ok") >= 2
    assert demod11.main(["--mode", "ack", "--rate", "24"]) == 0


def test_demod11_raw40_device_frontend(capsys):
    """Raw capture straight into the jax chain (no host preprocessing)."""
    from sora_tpu.apps import demod11

    rc = demod11.main(["--std", "11a", "--mode", "demod", "--chain", "jax",
                       "--msps", "40"])
    assert rc == 0
    assert "frame_ok" in capsys.readouterr().out


def test_srview_info_and_cut(tmp_path, capsys):
    """srview dump viewer/cutter (bintools srview analogue)."""
    from sora_tpu.apps import srview

    cap = "/root/reference/kernel/test-data/fsample-6.dmp"
    assert srview.main(["info", cap]) == 0
    out = capsys.readouterr().out
    assert "75320 samples" in out
    dst = str(tmp_path / "cut.dmp")
    assert srview.main(["cut", cap, dst, "1000", "15001"]) == 0
    assert srview.main(["info", dst]) == 0
    assert "14028 samples" in capsys.readouterr().out
    assert srview.main(["ascii", cap, "--bins", "40"]) == 0


def test_node_cli_smoke_with_radio_flags():
    """apps.node end to end: synthetic traffic through the SoftRadio
    front end (--rx-gain / --tune-error) decodes; the CLI itself is
    import-and-run clean (it once shipped a NameError in its banner)."""
    from sora_tpu.apps import node as appnode

    rc = appnode.main(["--synthetic", "4", "--rate", "12",
                       "--seconds", "1.0", "--rx-gain", "-10",
                       "--tune-error", "50000"])
    assert rc in (0, 1)          # 1 = not-realtime on CPU, frames still ok


def test_bridge_cli_selftest():
    """apps.bridge --pair --sockets --selftest: an application echo
    crosses A -> air -> B -> air -> A (the NIC reflection loop)."""
    from sora_tpu.apps import bridge as appbridge

    rc = appbridge.main(["--pair", "--sockets", "--selftest",
                         "--seconds", "30", "--mtu", "256",
                         "--window", "8192"])
    assert rc == 0


def test_usereg_cli_roundtrip(tmp_path, capsys):
    """Scripted register/knob read-write round trip through the usereg
    CLI (usr/usereg/usereg/usereg.cpp analogue over the persisted
    RADIO_CONTEXT image)."""
    from sora_tpu.apps import usereg
    from sora_tpu.runtime.radio import load_state

    st = str(tmp_path / "radio.json")
    assert usereg.main(["--state", st, "wr", "0x20", "0xBEEF"]) == 0
    assert usereg.main(["--state", st, "rr", "0x20"]) == 0
    assert capsys.readouterr().out.strip() == "0x0000BEEF"
    assert usereg.main(["--state", st, "set", "rxgain", "7.5"]) == 0
    assert usereg.main(["--state", st, "get", "rxgain"]) == 0
    assert capsys.readouterr().out.strip() == "7.5"
    state = load_state(st)
    assert state.registers[0x20] == 0xBEEF
    assert state.rx_gain_db == 7.5
    assert usereg.main(["--state", st, "dump"]) == 0
    assert "rx_gain_db" in capsys.readouterr().out
