"""Offline mod/demod harness — the demod11 analogue.

The reference's one-exe test harness (kernel/bb/demod11/main.cpp:27-57)
exposes `-11a/-11b/-11nbrick x -mod/-demod/-ack` over Sora dump files;
this is the same tool over sora_tpu chains:

  python -m sora_tpu.apps.demod11 --std 11a --mode demod --infile f.dmp
  python -m sora_tpu.apps.demod11 --std 11a --mode mod --rate 54 \
      --payload hello --outfile /tmp/w.dmp
  python -m sora_tpu.apps.demod11 --std 11a --mode ack

demod prints per-frame results and the MACStopwatch real-time report
(MACStopwatch.h:37-60); mod writes a dump the demod path (ours or the
reference's) can replay (ConvertModFile2DumpFile analogue, main.cpp:13);
ack golden-compares the generated ACK waveform between the JAX and numpy
chains (Test11AACK/CompareACK analogue, main.cpp:16-17).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _chains(std: str, chain: str):
    if std == "11a":
        from sora_tpu.golden import dot11a_np as g
        if chain == "jax":
            from sora_tpu.phy.dot11a import rx as jr
            return g, jr.demodulate
        return g, g.demodulate
    if std == "11b":
        from sora_tpu.golden import dot11b_np as g
        if chain == "jax":
            from sora_tpu.phy.dot11b import rx as jr
            return g, jr.demodulate
        return g, g.demodulate
    from sora_tpu.golden import dot11n_np as g
    if chain == "jax":
        from sora_tpu.phy.dot11n import rx as jr
        return g, jr.demodulate
    return g, g.demodulate


def _load(path: str, msps: int) -> np.ndarray:
    from sora_tpu.io.dumpfile import load_dump
    x = np.asarray(load_dump(path), dtype=np.complex128)
    x -= x.mean()
    if msps == 44:
        # 44 Msps NIC-interop capture: 10/11 resample + halfband on host
        # (the jax 11a chain instead takes the raw dump via
        # input_rate="44m" below — the CreateDemodGraph11a_44M path)
        import jax.numpy as jnp
        from sora_tpu.phy import frontend as fe
        return np.asarray(fe.ofdm_frontend_44m(
            jnp.asarray(x[None].astype(np.complex64))))[0]
    return x[:: msps // 20]


def run_demod(args) -> int:
    from sora_tpu.util.stopwatch import MacStopwatch

    g, demod = _chains(args.std, args.chain)
    raw40 = (args.chain == "jax" and args.std == "11a"
             and args.msps in (40, 44) and not args.host_frontend)
    if args.std == "11n":
        if len(args.infile) != 2:
            print("11n demod needs two --infile dumps (one per antenna)")
            return 2
        x = np.stack([_load(f, args.msps) for f in args.infile])
    elif raw40:
        # raw dump straight to the chain: DC removal + decimation run
        # on device (phy.frontend), like the live node's feed
        from sora_tpu.io.dumpfile import load_dump
        x = load_dump(args.infile[0])
    else:
        x = _load(args.infile[0], args.msps)
    sw = MacStopwatch(sample_rate=20e6)
    n = int(x.shape[-1] // (args.msps / 20.0)) if raw40 else x.shape[-1]
    with sw.segment(n):
        res = (demod(x, input_rate=f"{args.msps}m") if raw40
               else demod(x))
    rate = getattr(res, "rate_mbps", getattr(res, "mcs", "?"))
    print(f"frame: {res.reason} rate={rate} len={res.length} "
          f"fcs_ok={res.fcs_ok}")
    print(sw.report())
    return 0 if res.ok else 1


def run_mod(args) -> int:
    from sora_tpu.io.dumpfile import save_dump
    from sora_tpu.mac.frame import build_data_frame

    g, _ = _chains(args.std, "golden")
    psdu = build_data_frame(args.payload.encode(), seq=1)
    if args.std == "11n":
        wave = g.modulate(psdu, int(args.rate))
        for i in range(2):
            save_dump(f"{args.outfile}.s{i}", np.concatenate(
                [np.zeros(64), wave[i] * args.scale]), bits=14)
        print(f"wrote {args.outfile}.s0/.s1 ({wave.shape[1]} samples/chain,"
              f" mcs {int(args.rate)})")
        return 0
    rate = float(args.rate) if args.std == "11b" else int(args.rate)
    wave = g.modulate(psdu, rate)
    n = save_dump(args.outfile,
                  np.concatenate([np.zeros(64), wave * args.scale]),
                  bits=14)
    print(f"wrote {args.outfile} ({n} samples, rate {rate})")
    return 0


def run_ack(args) -> int:
    """Golden-compare ACK waveforms: JAX chain vs numpy model."""
    import jax.numpy as jnp

    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac.frame import build_ack_frame
    from sora_tpu.phy.dot11a import tx as jtx

    ack = build_ack_frame(b"\x02\x00\x00\x00\x00\x07")
    rate = int(args.rate)
    ref = g.modulate(ack, rate)
    wav = np.asarray(jtx.modulate(
        jnp.asarray(np.frombuffer(ack, np.uint8))[None], rate,
        len(ack)))[0]
    err = float(np.max(np.abs(wav - ref)))
    print(f"ACK rate {rate}: {len(ref)} samples, max |jax-golden| = "
          f"{err:.2e} -> {'MATCH' if err < 2e-3 else 'MISMATCH'}")
    return 0 if err < 2e-3 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="demod11",
                                description=__doc__.splitlines()[0])
    p.add_argument("--std", choices=["11a", "11b", "11n"], default="11a")
    p.add_argument("--mode", choices=["mod", "demod", "ack"],
                   default="demod")
    p.add_argument("--chain", choices=["golden", "jax"], default="golden")
    p.add_argument("--rate", default="6",
                   help="Mbps (11a/b) or MCS index (11n)")
    p.add_argument("--infile", action="append", default=None,
                   help="input dump (twice for 11n)")
    p.add_argument("--outfile", default="/tmp/sora_tpu_mod.dmp")
    p.add_argument("--payload", default="sora-tpu offline harness")
    p.add_argument("--msps", type=int, default=40, choices=[20, 40, 44],
                   help="dump sample rate (demod resamples to 20; 44 = "
                        "the commercial-NIC interop capture rate)")
    p.add_argument("--scale", type=float, default=2000.0,
                   help="TX amplitude in 14-bit dump units")
    p.add_argument("--host-frontend", action="store_true",
                   help="decimate/DC-remove on the host instead of the "
                        "on-device front end (jax 11a 40 Msps only)")
    args = p.parse_args(argv)

    from sora_tpu.util.platform import setup_jax
    setup_jax()          # honor JAX_PLATFORMS; persistent compile cache
    if args.mode == "demod":
        if not args.infile:
            args.infile = [
                "/root/reference/kernel/test-data/fsample-6.dmp"]
        return run_demod(args)
    if args.mode == "mod":
        return run_mod(args)
    return run_ack(args)


if __name__ == "__main__":
    sys.exit(main())
