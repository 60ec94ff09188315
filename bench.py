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

    # absorb the axon session's first-execution stall (measured: an
    # identical warm-cache run can pay 3 s or 65 s here purely on
    # tunnel state) with a trivial execute+fetch before the clock starts
    np.asarray(jnp.zeros(8, jnp.float32).sum() + 1.0)

    fn = lambda xb: jrx.rx_pipeline(xb, rate, max_psdu=max_psdu)
    t0 = time.perf_counter()
    out = fn(xd)
    ok = np.asarray(out["ok"])
    compile_s = time.perf_counter() - t0
    log(f"compile+first run: {compile_s:.1f}s; ok={int(ok.sum())}/{B}")
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
        for _ in range(50):
            o = f()
        np.asarray(sync(o))
        log(f"  stage {name:16s} {(time.perf_counter()-t0)/50*1e3:7.2f} ms")

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
    vfn = lambda s: vp.decode_blocks(s, block=1024, overlap=64, bt=768,
                                     terminated=False)
    got = np.asarray(vfn(sd))
    ber = float((got != bits).mean())
    t0 = time.perf_counter()
    for _ in range(100):
        o = vfn(sd)
    np.asarray(o)
    vdt = (time.perf_counter() - t0) / 100
    vmbps = B * T / vdt / 1e6
    # dispatch-free device time: 10 chained decodes inside one jit (the
    # per-call number above still carries ~0.5-0.7 ms of axon tunnel
    # dispatch; this is the kernel's true device throughput)
    @jax.jit
    def _vchain(s):
        def body(c, _):
            b = vp.decode_blocks(s * (1.0 + 1e-12 * c), block=1024,
                                 overlap=64, bt=768, terminated=False)
            return jnp.float32(b[0, 0]), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
        return c
    np.asarray(_vchain(sd))
    t0 = time.perf_counter()
    for _ in range(10):
        o = _vchain(sd)
    np.asarray(o)
    vdt0 = (time.perf_counter() - t0) / 100
    vmbps0 = B * T / vdt0 / 1e6
    log(f"  pallas viterbi (radix-4 int8 MXU): {vmbps:.1f} Mbit/s "
        f"per-call, {vmbps0:.1f} Mbit/s device (dispatch-free), "
        f"ber={ber:.1e}")
    # roofline (r05 attribution, tools/viterbi_probe.py, dispatch-free):
    # the fused (1024, 73) ACS matmul is the wall — it ran at ~80% of
    # MXU peak in bf16 (0.80 of 1.30 ms at the bench shape) and int8
    # operands (2x MXU rate on v5e) are the one real lever (1.30 ->
    # 0.92-0.99 ms).  NOT VMEM-bound as r04 claimed: that number was
    # polluted by per-call dispatch.  Interleaving two independent
    # half-lane streams bought 0% (Mosaic serializes MXU and VPU in one
    # instruction stream) and a VPU-side predecessor permutation
    # (t-major rows) was 2.7x slower, so ~2x of ideal-overlap headroom
    # remains structurally unreachable.
    nstep = (1024 + 128) // 4
    ntiles = -(-B * (-(-T // 1024)) // 768)
    log(f"  roofline: {vdt0 / (ntiles * nstep) * 1e6:.2f} "
        f"us/radix-4-step device ({ntiles} tiles x {nstep} steps)")

    # mixed-rate auto dispatch path (runtime rate demux, same batch shape)
    xa, Na, _ = _saturated_batch(rate, B, psdu_len, seed=3)
    xad = device_complex(xa)
    afn = lambda xb: jrx.rx_pipeline_auto(xb, max_psdu=max_psdu)
    adt, aok = _amortized(afn, xad, "ok", reps=30)
    log(f"  auto (mixed-rate) path: {B*Na/adt/1e6:.1f} Msamples/s, "
        f"ok={int(aok.sum())}/{B}")

    # TX modulator throughput (the mod-graph half; the reference's TX is
    # software too).  Sync handle is a strided real slice — complex
    # can't cross the axon boundary.
    from sora_tpu.phy.dot11a import tx as jtx
    arr = np.repeat(np.frombuffer(psdu, np.uint8)[None, :], B, axis=0)
    ad = jax.device_put(arr)
    wlen = int(jtx.modulate(ad, rate, arr.shape[1]).shape[1])
    # dispatch-free: 10 chained modulates in one jit (the carry's data
    # dependency defeats CSE); the per-call number jitters +-50% with
    # tunnel load and under-reports by the ~0.5-0.8 ms dispatch cost
    @jax.jit
    def _txchain(a):
        def body(c, _):
            w = jtx.modulate(a ^ c, rate, arr.shape[1])
            return (jnp.abs(jnp.real(w[0, 100])) > 1e9
                    ).astype(jnp.uint8), None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=10)
        return c
    np.asarray(_txchain(ad))
    t0 = time.perf_counter()
    for _ in range(10):
        o = _txchain(ad)
    np.asarray(o)
    tdt = (time.perf_counter() - t0) / 100
    tx_msps = B * wlen / tdt / 1e6
    log(f"  11a 54 Mbps TX modulate: {tx_msps:.1f} Msamples/s device "
        f"({tx_msps/20.0:.1f}x realtime), {B*psdu_len*8/tdt/1e6:.0f} "
        f"Mbps encoded")

    b_msps = _bench_11b(device_complex, log)
    n_msps = _bench_11n(device_complex, log)
    (node_fps, node_ratio, node_dev_ratio, sparse_ratio,
     compact_x) = _bench_node(log)
    rt_ratio = _bench_realtime(log)

    print(json.dumps({
        "metric": "dot11a54_rx_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s@20Msps",
        "vs_baseline": round(channels, 2),
        "decoded_mbps": round(decoded_mbps, 1),
        "viterbi_mbit_s": round(vmbps, 1),
        "b11_msps": round(b_msps, 2),
        "n11_msps": round(n_msps, 2),
        "node_frames_s": round(node_fps, 1),
        "node_rt_ratio": round(node_ratio, 3),
        "node_device_ratio": round(node_dev_ratio, 3),
        "node_sparse_device_ratio": round(sparse_ratio, 3),
        "node_compaction_speedup": round(compact_x, 2),
        "realtime_ratio": round(rt_ratio, 3),
        "tx_msps": round(tx_msps, 1),
        "compile_first_s": round(compile_s, 1),
    }))


def _bench_realtime(log):
    """Device-resident air (runtime/device_air.py): the live node loop
    at 20 Msps with the sample stream in HBM — the MACStopwatch bar met
    END TO END on this harness (ratio < 1.0).  Short confirmation run;
    the 60 s proofs live in REALTIME_rx.json / REALTIME_convo.json
    (tools/realtime_soak.py)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    import realtime_soak as rs
    res = rs.run_rx_soak(seconds=8.0, depth=6, log=log, strict=False)
    log(f"  device-air real-time: ratio {res['ratio']} "
        f"({res['frames_delivered']}/{res['frames_scheduled']} frames)")
    return res["ratio"]


def _bench_11b(device_complex, log):
    """Saturated 802.11b 11 Mbps CCK RX at 11 Msps chips."""
    from sora_tpu.golden import dot11b_np as gb
    from sora_tpu.mac import frame as fr
    from sora_tpu.phy.dot11b import rx as brx

    rng = np.random.default_rng(5)
    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, 972, dtype=np.uint8)), seq=2)
    wave = gb.modulate(psdu, 11).astype(np.complex64)
    B, N = 128, len(wave) + 400
    x = np.zeros((B, N), np.complex64)
    for i in range(B):
        x[i, 30 + (7 * i) % 300:][: len(wave)] = wave
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    xd = device_complex(x)
    fn = lambda xb: brx.rx_pipeline_auto(xb, max_psdu=1024)
    dt, ok = _amortized(fn, xd, "ok", reps=30)
    msps = B * N / dt / 1e6
    log(f"  11b CCK-11 auto path: {msps:.1f} Msamples/s@11Msps "
        f"({msps/11.0:.1f}x realtime), ok={int(ok.sum())}/{B}")
    return msps


def _bench_11n(device_complex, log):
    """Saturated 802.11n MCS15 2x2 RX at 20 Msps per antenna."""
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.mac import frame as fr
    from sora_tpu.phy.dot11n import rx as nrx

    rng = np.random.default_rng(6)
    psdu = fr.build_data_frame(
        bytes(rng.integers(0, 256, 1472, dtype=np.uint8)), seq=3)
    wave = gn.modulate(psdu, 15).astype(np.complex64)     # (2, n)
    B, N = 128, wave.shape[1] + 400
    x = np.zeros((B, 2, N), np.complex64)
    for i in range(B):
        off = 30 + (7 * i) % 300
        x[i, :, off: off + wave.shape[1]] = wave
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    xd = device_complex(x)
    fn = lambda xb: nrx.rx_pipeline(xb, 15, max_psdu=1504)
    dt, ok = _amortized(fn, xd, "ok", reps=30)
    msps = B * N / dt / 1e6
    log(f"  11n MCS15 2x2 path: {msps:.1f} Msamples/s@20Msps/ant "
        f"({msps/20.0:.1f}x realtime), ok={int(ok.sum())}/{B}, "
        f"{B * 1500 * 8 / dt / 1e6:.0f} Mbps decoded")

    # single-stream set (MCS 0-7, beyond the reference's 2-stream-only)
    psdu1 = fr.build_data_frame(
        bytes(rng.integers(0, 256, 1472, dtype=np.uint8)), seq=4)
    w1 = gn.modulate(psdu1, 7)[0].astype(np.complex64)
    N1 = len(w1) + 400
    x1 = np.zeros((B, 2, N1), np.complex64)
    for i in range(B):
        off = 30 + (7 * i) % 300
        x1[i, :, off: off + len(w1)] = w1
    x1 += (rng.normal(size=x1.shape) + 1j * rng.normal(size=x1.shape)
           ).astype(np.complex64) * 0.02
    x1d = device_complex(x1)
    fn1 = lambda xb: nrx.rx_pipeline_1ss(xb, 7, max_psdu=1504)
    dt1, ok1 = _amortized(fn1, x1d, "ok", reps=30)
    msps1 = B * N1 / dt1 / 1e6
    log(f"  11n MCS7 1ss path:  {msps1:.1f} Msamples/s@20Msps/ant "
        f"({msps1/20.0:.1f}x realtime), ok={int(ok1.sum())}/{B}")
    return msps


def _bench_node(log):
    """Live-node run: paced 20 Msps ring replay of dense traffic;
    reports (frames/s, avg real-time ratio) — the MACStopwatch bar
    (MACStopwatch.h:37-60) at the system level."""
    from sora_tpu.apps.node import synthetic_traffic
    from sora_tpu.runtime.native import RxRing
    from sora_tpu.runtime.node import NodeConfig, StreamingNode, TxSink

    addr = b"\x02SORA1"
    # the axon tunnel costs ~50 ms per host->device round trip, so the
    # batch must span >= that much air time to run real-time: 64 windows
    # of 32768 samples = 1.9 M samples/batch = 94 ms at 20 Msps.  On a
    # local PCIe-attached TPU the same config simply runs deeper ahead.
    cfg = NodeConfig(max_psdu=256, min_rate_mbps=24, window=32768,
                     batch=64, max_frames_per_window=11, addr=addr,
                     rate_mbps=None, wire="i8")
    ring = RxRing(capacity=1 << 25)
    node = StreamingNode(ring, cfg, tx_sink=TxSink())
    t0 = time.perf_counter()
    node.warm_up()
    log(f"  node warm_up: {time.perf_counter()-t0:.1f}s "
        f"(window={cfg.window} overlap={cfg.overlap} "
        f"K={cfg.max_frames_per_window})")
    src = synthetic_traffic(400, addr, mixed=False, rate=24, gap=900)
    ring.start_replay(src, rate_sps=20e6, loop=True)
    t_end = time.perf_counter() + 5.0
    while time.perf_counter() < t_end:
        if not node.step():
            time.sleep(0.001)
    ring.stop()
    node.flush()
    rep = node.sw.report()
    secs = 5.0
    fps = node.stats.frame_ok / secs
    log(f"  node: {node.stats.frame_ok} frames in {secs:.0f}s "
        f"({fps:.0f} frames/s), avg rt ratio {rep.avg_ratio:.3f}, "
        f"dups {node.stats.dup}, backlog_drop {node.stats.backlog_dropped}")
    # the wall-clock ratio on this harness is dominated by the axon
    # tunnel's host->device bandwidth (~20 MB/s measured; a local
    # PCIe-attached TPU host moves GB/s).  Report the device-compute
    # ratio too: amortized decode+detect time per batch over its air
    # time — the architecture's number, transfer excluded.
    import jax
    from sora_tpu.util.xfer import device_complex8, device_complex16
    hop = cfg.window - cfg.overlap
    nsamp = cfg.window + hop * (cfg.batch - 1)
    xb = np.asarray(src[:cfg.window])
    xw = np.stack([np.roll(xb, -37 * i)[: cfg.window]
                   for i in range(cfg.batch)])
    t0 = time.perf_counter()
    xd = device_complex16(xw)
    np.asarray(jax.block_until_ready(xd).dtype == np.complex64)
    xfer_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    xd8 = device_complex8(xw)
    np.asarray(jax.block_until_ready(xd8).dtype == np.complex64)
    xfer8_s = time.perf_counter() - t0
    out = node._decode(xd)
    np.asarray(out["ok"])
    t0 = time.perf_counter()
    for _ in range(20):
        d, _p = node._detect(xd)
        out = node._decode(xd)
    np.asarray(out["ok"])
    ddt = (time.perf_counter() - t0) / 20
    air = nsamp / cfg.sample_rate_sps
    dev_ratio = ddt / air
    log(f"  node device-only: {ddt*1e3:.1f} ms decode+detect per "
        f"{air*1e3:.0f} ms of air -> ratio {dev_ratio:.3f}; one-batch "
        f"transfer i16 {xfer_s*1e3:.0f} ms "
        f"({xw.nbytes/2/xfer_s/1e6:.0f} MB/s wire), "
        f"i8 {xfer8_s*1e3:.0f} ms (node runs the i8 wire)")

    # sparse-air candidate compaction (VERDICT r03 item 2): the decode
    # tail is shape-static, so without compaction idle air pays the full
    # batch*K extract/demap/Viterbi; with a decode_slots bucket only the
    # highest-det candidates pay it and the tail scales with frames
    # PRESENT.  Same program shapes as the node, ~1 frame per window.
    from sora_tpu.phy.dot11a import rx as arx

    src_sp = synthetic_traffic(80, addr, mixed=False, rate=24, gap=30000)
    xsp = np.asarray(src_sp)
    xw_sp = np.stack([xsp[(i * hop) % max(1, len(xsp) - cfg.window):]
                      [: cfg.window] for i in range(cfg.batch)])
    xd_sp = device_complex16(xw_sp)
    K = cfg.max_frames_per_window
    full = lambda xb: arx.rx_pipeline_auto(xb, max_psdu=cfg.max_psdu,
                                           n_frames=K)
    comp = lambda xb: arx.rx_pipeline_auto(xb, max_psdu=cfg.max_psdu,
                                           n_frames=K,
                                           n_decode=2 * cfg.batch)
    fdt, fok = _amortized(full, xd_sp, "ok", reps=10)
    cdt, cok = _amortized(comp, xd_sp, "ok", reps=10)
    assert int(cok.sum()) == int(fok.sum()), \
        (int(cok.sum()), int(fok.sum()))
    r_full, r_comp = fdt / air, cdt / air
    log(f"  sparse-air compaction: {int(fok.sum())} frames/batch; "
        f"full {cfg.batch * K} rows {fdt*1e3:.1f} ms (ratio "
        f"{r_full:.3f}) -> top-{2 * cfg.batch} rows {cdt*1e3:.1f} ms "
        f"(ratio {r_comp:.3f}), {fdt / cdt:.1f}x")
    ring.close()
    return fps, rep.avg_ratio, dev_ratio, r_comp, fdt / cdt


if __name__ == "__main__":
    main()
