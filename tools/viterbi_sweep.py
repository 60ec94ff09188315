"""Sweep Pallas Viterbi kernel configs (block, overlap, bt) on the real
TPU at the bench shape, printing Mbit/s for each — the tuning evidence
behind the defaults in ops/viterbi_pallas.py.

Usage: python tools/viterbi_sweep.py [B] [T]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from sora_tpu.dsp import viterbi as dvit
    from sora_tpu.ops import viterbi_pallas as vp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 12096
    print(f"backend={jax.default_backend()} shape B={B} T={T}", flush=True)

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (B, T), dtype=np.uint8)
    coded = np.asarray(dvit.encode(jnp.asarray(bits))).reshape(B, T, 2)
    soft = (2.0 * coded - 1.0).astype(np.float32) \
        + rng.normal(size=(B, T, 2)).astype(np.float32) * 0.25
    sd = jnp.asarray(soft)

    configs = [(512, 64, 512), (1024, 64, 512), (2048, 64, 512),
               (1024, 64, 768), (1024, 32, 512), (4096, 64, 256),
               (2048, 64, 768)]
    for block, ov, bt in configs:
        try:
            fn = lambda s: vp.decode_blocks(s, block=block, overlap=ov,
                                            bt=bt, terminated=False)
            t0 = time.perf_counter()
            got = np.asarray(fn(sd))
            tc = time.perf_counter() - t0
            ber = float((got != bits).mean())
            t0 = time.perf_counter()
            reps = 100
            for _ in range(reps):
                o = fn(sd)
            np.asarray(o)
            dt = (time.perf_counter() - t0) / reps
            print(f"block={block:5d} ov={ov:3d} bt={bt:4d}: "
                  f"{B*T/dt/1e6:8.1f} Mbit/s  ber={ber:.1e}  "
                  f"compile+first={tc:.1f}s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"block={block:5d} ov={ov:3d} bt={bt:4d}: FAIL {msg}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
