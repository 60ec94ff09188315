"""Benchmark: saturated 802.11a 54 Mbps RX chain throughput on one chip.

Prints ONE JSON line:
  {"metric": "dot11a54_rx_throughput", "value": <Msamples/s>,
   "unit": "Msamples/s@20Msps", "vs_baseline": <real-time channels>,
   "decoded_mbps": <payload bit throughput>}

Honesty rules (VERDICT r01 item 3): streams are back-to-back 1500-byte
54 Mbps frames with <4% idle margin — no padding inflation; timing is
amortized over pipelined batches with a final device fetch of the `ok`
vector (which transitively depends on the whole decode), because on the
axon backend only a fetch truly synchronizes; both sample throughput and
decoded payload bit throughput are reported.

vs_baseline is the number of simultaneous real-time 802.11a channels
sustained: the reference's bar is processing cost / signal duration < 1.0
for ONE 20 Msps channel stream on dedicated x86 cores
(kernel/bb/demod11/MACStopwatch.h:37-60), i.e. vs_baseline == 1.0 is
reference parity and N is an N-channel speedup.

Extra diagnostics (per-stage timings, Pallas Viterbi Mbit/s, mixed-rate
auto path) go to stderr so the driver's stdout contract stays one line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _saturated_batch(rate_mbps: int, B: int, psdu_len: int, seed: int = 1):
    """B streams, each one back-to-back frame + 160-sample margin."""
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac import frame as fr

    rng = np.random.default_rng(seed)
    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, psdu_len - 28, dtype=np.uint8)), seq=1)
    wave = g.modulate(psdu, rate_mbps).astype(np.complex64)
    N = len(wave) + 160
    x = np.zeros((B, N), np.complex64)
    for i in range(B):
        off = 25 + (13 * i) % 120
        x[i, off: off + len(wave)] = wave
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    return x, N, psdu


def _amortized(fn, xd, sync_key: str, reps: int = 60):
    """Warm, verify, then time `reps` pipelined dispatches with one final
    fetch.  Returns (seconds per call, last fetched sync array)."""
    out = fn(xd)
    ok = np.asarray(out[sync_key])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(xd)
    ok = np.asarray(out[sync_key])
    return (time.perf_counter() - t0) / reps, ok


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.util.xfer import device_complex

    log("backend:", jax.default_backend(), jax.devices())

    rate, psdu_len, B, max_psdu = 54, 1500, 128, 1504
    x, N, psdu = _saturated_batch(rate, B, psdu_len)
    occupancy = 1.0 - 160.0 / N
    xd = device_complex(x)

    fn = lambda xb: jrx.rx_pipeline(xb, rate, max_psdu=max_psdu)
    t0 = time.perf_counter()
    out = fn(xd)
    ok = np.asarray(out["ok"])
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s; "
        f"ok={int(ok.sum())}/{B}")
    assert ok.all(), "bench frames must decode"

    dt, ok = _amortized(fn, xd, "ok")
    assert ok.all()
    msps = B * N / dt / 1e6
    channels = msps / 20.0
    decoded_mbps = B * psdu_len * 8 / dt / 1e6
    log(f"saturated batch {B}x{N} ({occupancy*100:.1f}% frame samples): "
        f"{dt*1e3:.2f} ms/batch -> {msps:.1f} Msamples/s "
        f"({channels:.1f}x realtime), {decoded_mbps:.0f} Mbps decoded")

    # ---- diagnostics (stderr) ------------------------------------------------
    # per-stage amortized timings
    lts1, cfo, det = jrx.synchronize(xd)
    nsym = jrx.max_symbols(jrx.C.RATES[rate], max_psdu)
    eq, _ = jrx.extract_symbols(xd, lts1, cfo, nsym)
    length = jnp.full((B,), psdu_len, jnp.int32)

    def tstage(name, f, sync):
        o = f()
        np.asarray(sync(o))
        t0 = time.perf_counter()
        for _ in range(10):
            o = f()
        np.asarray(sync(o))
        log(f"  stage {name:16s} {(time.perf_counter()-t0)/10*1e3:7.2f} ms")

    tstage("synchronize", lambda: jrx.synchronize(xd), lambda o: o[2])
    tstage("extract_symbols",
           lambda: jrx.extract_symbols(xd, lts1, cfo, nsym),
           lambda o: o[1])
    tstage("decode_signal", lambda: jrx.decode_signal(eq[:, 0, :]),
           lambda o: o[2])
    tstage("decode_data",
           lambda: jrx.decode_data(eq[:, 1:, :], length, rate),
           lambda o: o[1])
    tstage("detect_only", lambda: jrx.detect_only(xd), lambda o: o[0])

    # Pallas Viterbi (the chain's decoder on TPU) at the chain's shape
    from sora_tpu.dsp import viterbi as dvit
    from sora_tpu.ops import viterbi_pallas as vp

    T = nsym * jrx.C.RATES[rate].ndbps
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (B, T), dtype=np.uint8)
    coded = np.asarray(dvit.encode(jnp.asarray(bits))).reshape(B, T, 2)
    soft = (2.0 * coded - 1.0).astype(np.float32) \
        + rng.normal(size=(B, T, 2)).astype(np.float32) * 0.25
    sd = jnp.asarray(soft)
    vfn = lambda s: vp.decode_blocks(s, block=512, overlap=64,
                                     terminated=False)
    got = np.asarray(vfn(sd))
    ber = float((got != bits).mean())
    t0 = time.perf_counter()
    for _ in range(100):
        o = vfn(sd)
    np.asarray(o)
    vdt = (time.perf_counter() - t0) / 100
    log(f"  pallas viterbi (radix-4): {B*T/vdt/1e6:.1f} Mbit/s, "
        f"ber={ber:.1e}")

    # mixed-rate auto dispatch path (runtime rate demux, same batch shape)
    xa, Na, _ = _saturated_batch(rate, B, psdu_len, seed=3)
    xad = device_complex(xa)
    afn = lambda xb: jrx.rx_pipeline_auto(xb, max_psdu=max_psdu)
    adt, aok = _amortized(afn, xad, "ok", reps=10)
    log(f"  auto (mixed-rate) path: {B*Na/adt/1e6:.1f} Msamples/s, "
        f"ok={int(aok.sum())}/{B}")

    print(json.dumps({
        "metric": "dot11a54_rx_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s@20Msps",
        "vs_baseline": round(channels, 2),
        "decoded_mbps": round(decoded_mbps, 1),
    }))


if __name__ == "__main__":
    main()
