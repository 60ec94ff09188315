"""One process of a multi-host (DCN) RX run — used by
tests/test_multihost.py which spawns two of these on CPU, and usable
directly on real multi-host TPU slices.

Each process contributes its host-local rows of the global batch (the
per-host radio feed), assembles the global array, and runs the sharded
pipeline; collectives ride the distributed backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-procs", type=int, required=True)
    p.add_argument("--proc-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--rate", type=int, default=12)
    p.add_argument("--out", default="")
    args = p.parse_args()

    if "JAX_PLATFORMS" not in os.environ:
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    # the container's sitecustomize pins jax_platforms=axon at import
    # time; env alone doesn't win — override before the backend exists
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from sora_tpu.parallel import distributed as dist

    dist.initialize(coordinator=args.coordinator,
                    num_processes=args.num_procs, process_id=args.proc_id)
    assert jax.process_count() == args.num_procs
    mesh = dist.global_mesh(dp=args.num_procs)

    # deterministic global traffic; every process builds the same batch
    # and keeps its own rows (the per-host ring feed)
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac import frame as fr

    rng = np.random.default_rng(42)
    # decode reshards batch-parallel over every device: B must divide by
    # the global device count
    B, N = args.local_devices * args.num_procs, 4096
    psdus, x = [], np.zeros((B, N), np.complex64)
    for i in range(B):
        psdu = fr.build_data_frame(
            bytes(rng.integers(0, 256, 52, dtype=np.uint8)), seq=i)
        psdus.append(psdu)
        w = g.modulate(psdu, args.rate).astype(np.complex64)
        x[i, 40 + 13 * i: 40 + 13 * i + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.01

    rows_per_proc = B // args.num_procs
    lo = args.proc_id * rows_per_proc
    x_local = x[lo: lo + rows_per_proc]
    xg = dist.from_process_local(x_local, mesh, P("dp", "sp"))

    from sora_tpu.parallel.shard import (rx_pipeline_sharded,
                                         rx_pipeline_sharded_auto)

    t0 = time.perf_counter()
    out = rx_pipeline_sharded(xg, mesh, args.rate, max_psdu=128)
    ok_g = out["ok"]
    # fetch only this process's addressable shards
    ok_local = np.concatenate(
        [np.asarray(s.data).reshape(-1) for s in ok_g.addressable_shards])
    dt = time.perf_counter() - t0
    n_ok = int(ok_local.sum())
    # mixed-rate runtime dispatch over the same multi-process mesh
    out_a = rx_pipeline_sharded_auto(xg, mesh, max_psdu=128)
    okau = np.concatenate(
        [np.asarray(s.data).reshape(-1)
         for s in out_a["ok"].addressable_shards])
    assert int(okau.sum()) == len(okau), "sharded auto failed multihost"
    result = {"proc": args.proc_id, "n_processes": jax.process_count(),
              "global_devices": len(jax.devices()),
              "ok_local": n_ok, "expect_local": len(ok_local),
              "wall_s": round(dt, 3)}
    print("RESULT " + json.dumps(result), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(result))
    assert n_ok == len(ok_local), result
    print("PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
