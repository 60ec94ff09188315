"""Live SDR node CLI — the umxsdrbrick analogue over replay/synthetic air.

Boots the native RX ring, starts a paced producer (dump replay or
synthetic multi-frame traffic), runs the StreamingNode poll loop (batched
device decode + soft MAC + pre-staged ACKs), and prints the err_stat
status page and the MACStopwatch real-time report
(kernel/bb/umxsdrbrick/dot11main.cpp:365-457, mgmt.h:81,
demod11/MACStopwatch.h:37-60).

Examples
--------
Replay the golden capture, looped, paced at 40 Msps::

    python -m sora_tpu.apps.node --dump \
        /root/reference/kernel/test-data/fsample-6.dmp --loop --seconds 3

Synthetic mixed-rate traffic at 20 Msps::

    python -m sora_tpu.apps.node --synthetic 64 --mixed --pace 20e6
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_traffic(n_frames: int, addr: bytes, mixed: bool,
                      rate: float, gap: int = 900,
                      seed: int = 7, phy: str = "a") -> np.ndarray:
    """A stream of n_frames data frames addressed to `addr`, rate-mixed if
    requested, separated by idle gaps.  phy "a": 20 Msps OFDM; "b":
    11 Msps DSSS chips (gap is scaled up — the node hop must stay below
    the inter-frame gap); "n": (2, N) 2x2 MIMO at 20 Msps."""
    from sora_tpu.mac.frame import MacHeader, append_fcs

    rng = np.random.default_rng(seed)
    if phy == "b":
        from sora_tpu.golden import dot11b_np as gm
        rates = [1, 2, 5.5, 11] if mixed else [rate]
        gap = max(gap, 2400)
    elif phy == "n":
        from sora_tpu.golden import dot11n_np as gm
        rates = list(range(8, 16)) if mixed else [int(rate)]
        gap = max(gap, 3200)   # >= node hop: first-preamble lock decodes
        #                        one frame per window
    else:
        from sora_tpu.golden import dot11a_np as gm
        rates = [6, 9, 12, 18, 24, 36, 48, 54] if mixed else [int(rate)]
    pieces = []
    for i in range(n_frames):
        hdr = MacHeader(addr1=addr, addr2=b"\x02PEER0", addr3=addr,
                        seq_ctrl=(i & 0xFFF) << 4)
        nb = 60 if phy == "b" else 120
        payload = bytes(rng.integers(0, 256, nb, dtype=np.uint8))
        psdu = append_fcs(hdr.pack() + payload)
        w = gm.modulate(psdu, rates[i % len(rates)]).astype(np.complex64)
        z = np.zeros(w.shape[:-1] + (gap,), np.complex64)
        pieces.append(z)
        pieces.append(w)
    pieces.append(np.zeros(pieces[0].shape[:-1] + (gap,), np.complex64))
    x = np.concatenate(pieces, axis=-1)
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01
    return x


_A_RATES = [6, 9, 12, 18, 24, 36, 48, 54]
_B_RATES = [1, 2, 5.5, 11]


def _process_kb(node, phy: str) -> bool:
    """Non-blocking stdin control — the reference UI loop's live
    reconfiguration (process_kb, dot11main.cpp:148-204).  Keys:
    1-8 fixed rate/MCS, 0 auto dispatch, t/T detect threshold down/up,
    p promiscuous toggle, s status page, q quit.  Returns False on q."""
    import select

    while True:
        ready, _, _ = select.select([sys.stdin], [], [], 0)
        if not ready:
            return True
        ch = sys.stdin.read(1)
        if not ch:
            return True
        if ch == "q":
            return False
        if ch == "s":
            _log(node.report())
        elif ch == "p":
            node.reconfigure(promiscuous=not node.cfg.promiscuous)
            _log(f"promiscuous={node.cfg.promiscuous}")
        elif ch in "tT":
            thr = node.cfg.detect_threshold * (1.25 if ch == "T" else 0.8)
            node.reconfigure(detect_threshold=thr)
            _log(f"detect_threshold={thr:.3f}")
        elif ch == "0":
            node.reconfigure(rate_mbps=None, mcs=None, warm=True)
            _log("rate=auto")
        elif ch.isdigit():
            i = int(ch) - 1
            if phy == "b":
                if i < len(_B_RATES):
                    node.reconfigure(rate_mbps=_B_RATES[i], warm=True)
                    _log(f"rate={_B_RATES[i]} Mbps")
            elif phy == "n":
                node.reconfigure(mcs=8 + i, warm=True)
                _log(f"mcs={8 + i}")
            elif i < len(_A_RATES):
                node.reconfigure(rate_mbps=_A_RATES[i], warm=True)
                _log(f"rate={_A_RATES[i]} Mbps")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sora_tpu.apps.node",
                                description=__doc__.split("\n")[0])
    p.add_argument("--phy", default="a", choices=("a", "b", "n"),
                   help="PHY mode (umxsdrbrick -b / -n flags)")
    p.add_argument("--dump", help="replay a Sora dump file into the ring")
    p.add_argument("--loop", action="store_true",
                   help="loop the replay source")
    p.add_argument("--synthetic", type=int, metavar="N", default=0,
                   help="generate N synthetic data frames instead")
    p.add_argument("--mixed", action="store_true",
                   help="synthetic traffic cycles all 8 rates")
    p.add_argument("--rate", type=float, default=0.0,
                   help="synthetic traffic rate: Mbps (11a/11b) or MCS "
                        "index (11n); 0 = per-phy default")
    p.add_argument("--pace", type=float, default=0.0,
                   help="producer pacing in samples/s (0 = unpaced); "
                        "dump replay defaults to its design rate")
    p.add_argument("--msps", type=int, default=40, choices=(20, 40),
                   help="dump sample rate (chooses the device front end)")
    p.add_argument("--seconds", type=float, default=2.0,
                   help="how long to run the node loop")
    p.add_argument("--batch", type=int, default=0,
                   help="windows per device batch (0 = auto)")
    p.add_argument("--window", type=int, default=0,
                   help="samples per window (0 = auto)")
    p.add_argument("--status-every", type=float, default=0.0,
                   help="print the status page every S seconds")
    p.add_argument("--keys", action="store_true",
                   help="interactive stdin control: 1-8 rate/MCS, 0 auto, "
                        "t/T threshold, p promiscuous, s status, q quit "
                        "(process_kb, dot11main.cpp:148-204)")
    p.add_argument("--config", default=None,
                   help="NodeConfig JSON file (layered under env "
                        "SORA_* and explicit flags; util/config.py)")
    p.add_argument("--rx-gain", type=float, default=None, metavar="DB",
                   help="radio RX gain in dB (SoraURadioSetRxGain over "
                        "the software front end, runtime/radio.py)")
    p.add_argument("--freq-offset", type=float, default=0.0, metavar="HZ",
                   help="radio fine frequency offset "
                        "(SoraURadioSetFreqOffset)")
    p.add_argument("--tune-error", type=float, default=0.0, metavar="HZ",
                   help="simulated central-frequency mismatch vs the "
                        "air (SetCentralFreq delta)")
    p.add_argument("--wire", default="i16", choices=("i16", "i8"),
                   help="host->device sample wire format")
    args = p.parse_args(argv)

    from sora_tpu.util.platform import setup_jax
    setup_jax()          # honor JAX_PLATFORMS; persistent compile cache

    from sora_tpu.runtime.native import RxRing
    from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink

    addr = b"\x02SORA1"
    rate = args.rate or {"a": 6, "b": 2, "n": 8}[args.phy]
    if args.dump:
        if args.phy != "a":
            p.error("--dump replay is the 11a capture path; use "
                    "--synthetic with --phy b/n")
        from sora_tpu.runtime.native import parse_dump
        src = parse_dump(args.dump)
        input_rate = "40m" if args.msps == 40 else "20m"
        rate_sps = args.pace or float(args.msps) * 1e6
        batch = args.batch or 4
        max_psdu = 1600
        min_rate = 6.0
    else:
        if not args.synthetic:
            p.error("need --dump or --synthetic N")
        src = synthetic_traffic(args.synthetic, addr, args.mixed, rate,
                                phy=args.phy)
        input_rate = "11m" if args.phy == "b" else "20m"
        rate_sps = args.pace
        batch = args.batch or 8
        max_psdu = 256
        if args.mixed:
            min_rate = {"a": 6.0, "b": 1.0, "n": 8.0}[args.phy]
        else:
            min_rate = rate

    from sora_tpu.util.config import load_config

    # window/overlap auto-size from (max_psdu, min_rate) inside
    # NodeConfig.__post_init__ — no per-source hand math (VERDICT r02)
    default_sps = 11e6 if args.phy == "b" else 20e6
    cfg = load_config(NodeConfig, path=args.config, overrides=dict(
        phy=args.phy, window=args.window, batch=batch, overlap=0,
        input_rate=input_rate, max_psdu=max_psdu, addr=addr,
        min_rate_mbps=min_rate, wire=args.wire,
        mcs=(None if args.mixed or args.phy != "n" else int(rate)),
        sample_rate_sps=rate_sps or default_sps))
    if (args.rx_gain is not None or args.freq_offset
            or args.tune_error) and src.ndim == 1:
        # run the source through the radio front end (gain, tuning) —
        # the SoraURadioSetRxGain/SetCentralFreq path over software
        from sora_tpu.runtime.radio import SoftRadio
        radio = SoftRadio()
        radio.attach_air(src, freq_hz=2.422e9,
                         rate_sps=rate_sps or default_sps)
        if args.rx_gain is not None:
            radio.set_rx_gain(args.rx_gain)
        radio.set_central_freq(2.422e9 + args.tune_error)
        radio.set_freq_offset(args.freq_offset)
        src = radio.capture()
        _log(f"radio: rx_gain={radio.state.rx_gain_db} dB "
             f"tune_error={args.tune_error:+.0f} Hz "
             f"freq_offset={args.freq_offset:+.0f} Hz")
    if args.phy == "n":
        rings = [RxRing(capacity=1 << 22), RxRing(capacity=1 << 22)]
    else:
        rings = [RxRing(capacity=1 << 22)]
    ring = rings if args.phy == "n" else rings[0]
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    _log(f"node: window={cfg.window} batch={cfg.batch} "
         f"overlap={cfg.overlap} front_end={input_rate} "
         f"pace={(rate_sps or default_sps)/1e6:.1f} Msps "
         f"src={src.shape[-1]} samples loop={bool(args.loop or args.dump)}")
    _log("compiling device programs ...")
    t0 = time.perf_counter()
    node.warm_up()
    _log(f"compiled in {time.perf_counter() - t0:.1f}s")

    loop = bool(args.loop) or bool(args.dump)
    for a, r in enumerate(rings):
        r.start_replay(src[a] if src.ndim == 2 else src,
                       rate_sps=rate_sps, loop=loop)
    t_end = time.perf_counter() + args.seconds
    t_status = time.perf_counter() + (args.status_every or 1e9)
    try:
        while time.perf_counter() < t_end:
            if not node.step():
                time.sleep(0.001)
            if time.perf_counter() >= t_status:
                _log(node.stats.status_page())
                t_status = time.perf_counter() + args.status_every
            if args.keys and not _process_kb(node, args.phy):
                break
    finally:
        for r in rings:
            r.stop()
    node.flush()
    print(node.report())
    rep = node.sw.report()
    ok = node.stats.frame_ok > 0 and rep.avg_ratio < 1.0
    print(f"node {'OK' if ok else 'NOT-REALTIME-OR-IDLE'}: "
          f"{node.stats.frame_ok} frames, {node.stats.acks_tx} acks, "
          f"avg ratio {rep.avg_ratio:.3f}")
    for r in rings:
        r.close()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
