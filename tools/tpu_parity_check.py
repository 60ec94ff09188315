"""Real-TPU parity checks: compiled (non-interpret) Pallas kernels vs the
XLA reference decoders, plus the golden-capture decode on hardware.

Run standalone on a machine with a TPU attached::

    python tools/tpu_parity_check.py

Exits 0 with "PASS" lines on success; exits 2 if no TPU backend is
available (callers treat that as a skip).  tests/test_tpu_parity.py
invokes this in a subprocess so the CPU-pinned pytest environment can
still exercise the hardware path when present.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_T0 = time.perf_counter()


def _t() -> str:
    return f"[{time.perf_counter() - _T0:6.1f}s]"

CAPTURE = "/root/reference/kernel/test-data/fsample-6.dmp"


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 2

    from sora_tpu.dsp import viterbi as dvit
    from sora_tpu.ops import viterbi_pallas as vp

    rng = np.random.default_rng(0xB0B)
    fails = 0

    # 1. Pallas Viterbi (compiled, non-interpret) vs exact XLA decode.
    # The kernel quantizes soft inputs to 8-bit ints (viterbi_pallas
    # SOFT_SCALE); feed the XLA decoder the SAME quantized values so the
    # only residual differences are exact-tie resolutions (both paths
    # then return equal-metric maximum-likelihood decodes).
    B, T = 16, 4096
    bits = rng.integers(0, 2, (B, T), dtype=np.uint8)
    coded = np.asarray(dvit.encode(jnp.asarray(bits))).reshape(B, T, 2)
    soft = (2.0 * coded - 1.0).astype(np.float32) \
        + rng.normal(size=(B, T, 2)).astype(np.float32) * 0.3
    soft = np.clip(np.round(soft * vp.SOFT_SCALE), -vp.SOFT_CLAMP,
                   vp.SOFT_CLAMP) / vp.SOFT_SCALE
    sd = jnp.asarray(soft.astype(np.float32))
    got_p = np.asarray(vp.decode_blocks(sd, block=512, overlap=64,
                                        terminated=False))
    got_x = np.asarray(dvit.decode(sd, terminated=False))
    ber_p = float((got_p != bits).mean())
    ber_x = float((got_x != bits).mean())
    agree = float((got_p == got_x).mean())
    ok = ber_p <= ber_x + 1e-4 and agree > 0.999
    fails += not ok
    print(f"{_t()} {'PASS' if ok else 'FAIL'}: pallas viterbi compiled "
          f"ber={ber_p:.2e} agree_vs_xla={agree:.6f}", flush=True)

    # 2. Short terminated windows (the SIGNAL-decode shape)
    bits_s = rng.integers(0, 2, (64, 24), dtype=np.uint8)
    bits_s[:, -6:] = 0
    coded_s = np.asarray(dvit.encode(jnp.asarray(bits_s))).reshape(64, 24, 2)
    soft_s = (2.0 * coded_s - 1.0).astype(np.float32)
    got_s = np.asarray(vp.decode_blocks(jnp.asarray(soft_s), block=24,
                                        overlap=0, terminated=True))
    ok = (got_s == bits_s).all()
    fails += not ok
    print(f"{_t()} {'PASS' if ok else 'FAIL'}: pallas viterbi 24-step "
          "terminated", flush=True)

    # 3. Golden capture, raw 40 Msps, on-device front end, on real TPU
    from sora_tpu.io.dumpfile import load_dump
    from sora_tpu.phy.dot11a import rx as arx

    raw = load_dump(CAPTURE)
    res = arx.demodulate(raw, input_rate="40m")
    ok = res.ok and res.rate_mbps == 6 and res.length == 1392
    fails += not ok
    print(f"{_t()} {'PASS' if ok else 'FAIL'}: capture decode on TPU "
          f"({res.reason}, rate={res.rate_mbps}, len={res.length})",
          flush=True)

    # 4. Batched mixed-rate pipeline on TPU
    from sora_tpu.golden import dot11a_np as g
    from sora_tpu.mac import frame as fr
    from sora_tpu.util.xfer import device_complex

    rates = [6, 12, 24, 54]
    x = np.zeros((4, 4096), np.complex64)
    psdus = []
    for i, r in enumerate(rates):
        psdu = fr.build_data_frame(bytes(rng.integers(
            0, 256, 60, dtype=np.uint8)), seq=i)
        psdus.append(psdu)
        w = g.modulate(psdu, r).astype(np.complex64)
        x[i, 50: 50 + len(w)] = w
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)
          ).astype(np.complex64) * 0.02
    out = arx.rx_pipeline_auto(device_complex(x), max_psdu=256)
    okv = np.asarray(out["ok"])
    mb = [int(v) for v in np.asarray(out["rate_mbps"])]
    ok = okv.all() and mb == rates
    fails += not ok
    print(f"{_t()} {'PASS' if ok else 'FAIL'}: mixed-rate auto pipeline "
          f"on TPU ok={okv.tolist()} rates={mb}", flush=True)

    print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
