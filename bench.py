"""Benchmark: batched 802.11a 54 Mbps RX chain throughput on one chip.

Prints ONE JSON line:
  {"metric": "dot11a54_rx_throughput", "value": <Msamples/s>,
   "unit": "Msamples/s@20Msps", "vs_baseline": <real-time channels>}

vs_baseline is the number of simultaneous real-time 802.11a channels
sustained: the reference's bar is processing cost / signal duration < 1.0
for ONE 20 Msps channel stream on dedicated x86 cores
(kernel/bb/demod11/MACStopwatch.h:37-60), i.e. vs_baseline == 1.0 is
reference parity and N is an N-channel speedup.

Extra diagnostics (per-stage timings, Viterbi Mbps) go to stderr so the
driver's stdout contract stays one line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from sora_tpu.dsp import viterbi as dvit
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.util.xfer import device_complex

    log("backend:", jax.default_backend(), jax.devices())

    rate, max_psdu = 54, 1600
    B, N = 64, 8192
    x = _example_batch(rate, n_streams=B, n_samples=N, psdu_len=1500)
    xd = device_complex(x)   # complex64 cannot cross the axon boundary

    fn = lambda xb: jrx.rx_pipeline(xb, rate, max_psdu=max_psdu)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(xd))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s; "
        f"ok={int(np.asarray(out['ok']).sum())}/{B}")
    assert np.asarray(out["ok"]).all(), "bench frames must decode"

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(xd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    samples = B * N
    msps = samples / dt / 1e6
    channels = msps / 20.0
    # decoded payload bits throughput
    payload_bits = int(np.asarray(out["length"]).sum()) * 8
    log(f"batch {B}x{N}: {dt*1e3:.2f} ms -> {msps:.1f} Msamples/s "
        f"({channels:.1f}x realtime), {payload_bits/dt/1e6:.0f} Mbps decoded")

    # Viterbi-only diagnostic
    T = 4096
    soft = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T, 2)).astype(np.float32))
    vfn = lambda s: dvit.decode_blocks(s, block=512, overlap=96,
                                       terminated=False)
    jax.block_until_ready(vfn(soft))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = vfn(soft)
    jax.block_until_ready(o)
    vdt = (time.perf_counter() - t0) / reps
    log(f"viterbi decode_blocks: {B*T/vdt/1e6:.1f} Mbit/s")

    print(json.dumps({
        "metric": "dot11a54_rx_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s@20Msps",
        "vs_baseline": round(channels, 2),
    }))


if __name__ == "__main__":
    main()
