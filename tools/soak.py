"""Node soak test: sustained looped traffic, invariant + leak checks.

The reference's stability story is running umxsdrbrick for hours; the
bench's 5 s window cannot catch slow leaks or unbounded state.  This
tool loops mixed-rate traffic through the live node for ``--seconds``
and checks the long-run invariants:

* decode keeps up (frame_ok strictly increasing between checkpoints),
* bounded state: dedup table, ACK-latency deque, carry/pending queues,
* RSS stable (no growth trend beyond the first warm-up checkpoints),
* zero crc_fail on clean looped air.

Run::

    JAX_PLATFORMS=cpu python tools/soak.py --seconds 30
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--phy", default="a", choices=("a", "b"))
    p.add_argument("--wire", default="i8", choices=("i16", "i8"))
    p.add_argument("--channel", action="store_true",
                   help="run the air through the radio's ChannelModel "
                        "(4-tap in-CP multipath + 55 kHz Doppler + "
                        "20 ppm SFO + antenna noise)")
    args = p.parse_args(argv)

    from sora_tpu.util.platform import setup_jax
    setup_jax()

    from sora_tpu.apps.node import synthetic_traffic
    from sora_tpu.runtime.native import RxRing
    from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink

    addr = b"\x02SORA1"
    cfg = NodeConfig(phy=args.phy, max_psdu=256, min_rate_mbps=6,
                     addr=addr, rate_mbps=None, wire=args.wire,
                     input_rate="11m" if args.phy == "b" else "20m",
                     sample_rate_sps=11e6 if args.phy == "b" else 20e6)
    ring = RxRing(capacity=1 << 24)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    print(f"soak: phy={args.phy} wire={args.wire} window={cfg.window} "
          f"batch={cfg.batch}", flush=True)
    node.warm_up()
    src = synthetic_traffic(64, addr, mixed=True, rate=6, phy=args.phy)
    if args.channel:
        import numpy as np

        from sora_tpu.runtime.radio import ChannelModel, SoftRadio
        radio = SoftRadio()
        radio.attach_air(src, rate_sps=cfg.sample_rate_sps)
        from sora_tpu.runtime.radio import REF_TAPS
        radio.set_channel(ChannelModel(
            taps=REF_TAPS, doppler_hz=55e3, sfo_ppm=20.0,
            noise_rms=0.01, seed=9))
        src = radio.capture()
        print("channel: 4-tap multipath + 55 kHz doppler + 20 ppm sfo "
              "+ antenna noise", flush=True)
    # unpaced loop: the node is the rate limiter; the watchdog handles
    # backlog — a soak exercises exactly that steady state
    ring.start_replay(src, rate_sps=cfg.sample_rate_sps, loop=True)

    t_end = time.perf_counter() + args.seconds
    checkpoints = []
    next_ck = time.perf_counter() + 5.0
    while time.perf_counter() < t_end:
        if not node.step():
            time.sleep(0.001)
        if time.perf_counter() >= next_ck:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            checkpoints.append((node.stats.frame_ok, rss,
                                len(node._seen), len(node._pend),
                                len(node._det_pend)))
            next_ck += 5.0
    ring.stop()
    node.flush()
    ring.close()

    print(node.report(), flush=True)
    ok = True
    if len(checkpoints) >= 2:
        frames = [c[0] for c in checkpoints]
        if not all(b > a for a, b in zip(frames, frames[1:])):
            print("FAIL: frame_ok stalled between checkpoints", frames)
            ok = False
        # RSS after the first checkpoint (warm) must not keep climbing
        rss = [c[1] for c in checkpoints[1:]]
        if len(rss) >= 2 and rss[-1] > rss[0] * 1.15:
            print(f"FAIL: RSS grew {rss[0]} -> {rss[-1]} KB")
            ok = False
    # truncated = frames straddling the window end (decoded from the
    # next overlap; boundary accounting) — only genuine crc_fail counts
    if node.stats.crc_fail > 0.02 * max(1, node.stats.frame_ok):
        print(f"FAIL: crc_fail {node.stats.crc_fail} vs "
              f"frame_ok {node.stats.frame_ok} "
              f"(truncated {node.stats.truncated})")
        ok = False
    if len(node._seen) > 4096 or node.stats.ack_latency_s.maxlen != 4096:
        print("FAIL: unbounded state")
        ok = False
    print("soak", "OK" if ok else "FAILED",
          f"({node.stats.frame_ok} frames, "
          f"{len(checkpoints)} checkpoints)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
