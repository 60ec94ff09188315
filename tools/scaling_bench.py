"""Scaling measurements for SCALING.md (BASELINE.md: "Msamples/s at
1 chip, 1 host, >=2 hosts; report efficiency").

Two sections:

* ``--tpu``: single-chip batch-scaling curve of the 54 Mbps RX chain —
  throughput vs batch size on the real TPU (how quickly the chip
  saturates; the per-dispatch overhead floor shows at small B).
* ``--cpu-mesh``: sharding-overhead factor on the virtual 8-device CPU
  mesh.  All virtual devices timeshare the same host cores, so wall
  clock CANNOT speed up with device count — the meaningful number is
  T(n devices) / T(1 device) at fixed total work: everything above 1.0
  is the cost the collectives, halo exchanges and reshards add to the
  program.  Real scaling happens on real chips (ICI); this pins down
  the communication overhead of the (dp, sp) program itself.

Usage::

    python tools/scaling_bench.py --tpu        # on the TPU terminal
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --cpu-mesh
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_tpu_batch_curve() -> int:
    from sora_tpu.util.platform import setup_jax
    jax = setup_jax()
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend {jax.default_backend()}")
        return 2
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.util.xfer import device_complex
    import bench as topbench

    rate, psdu_len, max_psdu = 54, 1500, 1504
    print("single-chip batch scaling, 54 Mbps saturated RX:", flush=True)
    for B in (16, 64, 128, 256):
        x, N, _ = topbench._saturated_batch(rate, B, psdu_len)
        xd = device_complex(x)
        fn = lambda xb: jrx.rx_pipeline(xb, rate, max_psdu=max_psdu)
        t0 = time.perf_counter()
        ok = np.asarray(fn(xd)["ok"])
        tc = time.perf_counter() - t0
        assert ok.all()
        t0 = time.perf_counter()
        reps = 60
        for _ in range(reps):
            out = fn(xd)
        np.asarray(out["ok"])
        dt = (time.perf_counter() - t0) / reps
        print(f"  B={B:4d}: {B*N/dt/1e6:7.1f} Msamples/s  "
              f"({dt*1e3:6.2f} ms/batch, compile+first {tc:.0f}s)",
              flush=True)
    return 0


def bench_tpu_sharded() -> int:
    """Sharded-program cost on the REAL chip (VERDICT r03 item 6): run
    the (dp, sp)-sharded pipelines on a (1, 1) mesh of the one real TPU
    and compare against the unsharded pipelines at identical shapes —
    an upper bound on the sharding tax with zero extra hardware (the
    collectives degenerate to no-ops; what remains is program structure:
    halo concats, reshards, the multi-dispatch orchestration)."""
    from sora_tpu.util.platform import setup_jax
    jax = setup_jax()
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend {jax.default_backend()}")
        return 2
    from sora_tpu.parallel import shard as psh
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.util.xfer import device_complex
    import bench as topbench

    rate, psdu_len, max_psdu = 54, 1500, 1504
    B = 128
    x, N, _ = topbench._saturated_batch(rate, B, psdu_len)
    mesh = psh.make_mesh(1)
    xd = device_complex(x)
    print(f"sharded-program cost on the real chip, (1,1) mesh, "
          f"B={B} x {N} @54 Mbps:", flush=True)

    def timed(name, fn, reps=20):
        t0 = time.perf_counter()
        ok = np.asarray(fn()["ok"])
        tc = time.perf_counter() - t0
        assert ok.all(), (name, int(ok.sum()))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out["ok"])
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:22s} {dt*1e3:7.2f} ms/batch "
              f"({B*N/dt/1e6:6.1f} Msamples/s, compile+first {tc:.0f}s)",
              flush=True)
        return dt

    t_plain = timed("rx_pipeline",
                    lambda: jrx.rx_pipeline(xd, rate, max_psdu=max_psdu))
    t_shard = timed("rx_pipeline_sharded",
                    lambda: psh.rx_pipeline_sharded(xd, mesh, rate,
                                                    max_psdu=max_psdu))
    t_auto = timed("rx_pipeline_auto",
                   lambda: jrx.rx_pipeline_auto(xd, max_psdu=max_psdu))
    t_sauto = timed("rx_pipeline_sharded_auto",
                    lambda: psh.rx_pipeline_sharded_auto(
                        xd, mesh, max_psdu=max_psdu))
    print(f"  sharding tax: fixed-rate {t_shard/t_plain:4.2f}x, "
          f"auto {t_sauto/t_auto:4.2f}x", flush=True)
    return 0


def bench_cpu_mesh() -> int:
    from sora_tpu.util.platform import setup_jax
    jax = setup_jax()
    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        print(f"SKIP: need 8 CPU devices, have "
              f"{len(jax.devices())} {jax.default_backend()}")
        return 2
    from sora_tpu.parallel import shard as psh
    import bench as topbench

    rate, psdu_len, max_psdu = 12, 80, 128
    B, N = 32, 4096
    x, N, _ = topbench._saturated_batch(rate, B, psdu_len)
    print("sharding overhead on the shared-core CPU mesh "
          "(fixed total work; ideal factor = 1.0):", flush=True)
    times = {}
    for n_dev in (1, 2, 8):
        mesh = psh.make_mesh(n_dev)
        fn = lambda: psh.rx_pipeline_sharded(x, mesh, rate,
                                             max_psdu=max_psdu)
        ok = np.asarray(fn()["ok"])
        assert ok.all(), ok
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        np.asarray(out["ok"])
        dt = (time.perf_counter() - t0) / 3
        times[n_dev] = dt
        print(f"  devices={n_dev} (mesh {dict(mesh.shape)}): "
              f"{dt*1e3:7.1f} ms/batch  overhead factor "
              f"{dt/times[1]:4.2f}x", flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tpu", action="store_true")
    p.add_argument("--tpu-sharded", action="store_true")
    p.add_argument("--cpu-mesh", action="store_true")
    args = p.parse_args(argv)
    rc = 0
    if args.tpu:
        rc = bench_tpu_batch_curve() or rc
    if args.tpu_sharded:
        rc = bench_tpu_sharded() or rc
    if args.cpu_mesh:
        rc = bench_cpu_mesh() or rc
    return rc


if __name__ == "__main__":
    sys.exit(main())
