"""Deep-pipelined per-stage profile of the 11a chain at the bench shape
(the 10-rep stage timings in bench.py are dominated by the ~50 ms axon
fetch round trip; this amortizes over 100 dispatches)."""
import sys, time
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from sora_tpu.util.platform import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    from sora_tpu.phy.dot11a import rx as jrx
    from sora_tpu.util.xfer import device_complex
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    rate, psdu_len, B, max_psdu = 54, 1500, 128, 1504
    x, N, psdu = bench._saturated_batch(rate, B, psdu_len)
    xd = device_complex(x)
    lts1, cfo, det = jrx.synchronize(xd)
    nsym = jrx.max_symbols(jrx.C.RATES[rate], max_psdu)
    eq, _ = jrx.extract_symbols(xd, lts1, cfo, nsym)
    length = jnp.full((B,), psdu_len, jnp.int32)

    def t(name, f, sync, reps=100):
        o = f(); np.asarray(sync(o))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f()
        np.asarray(sync(o))
        dt = (time.perf_counter()-t0)/reps
        print(f"  {name:20s} {dt*1e3:7.2f} ms", flush=True)
        return dt

    tot = 0.0
    tot += t("synchronize", lambda: jrx.synchronize(xd), lambda o: o[2])
    tot += t("extract_symbols", lambda: jrx.extract_symbols(xd, lts1, cfo, nsym), lambda o: o[1])
    tot += t("decode_signal", lambda: jrx.decode_signal(eq[:, 0, :]), lambda o: o[2])
    tot += t("decode_data", lambda: jrx.decode_data(eq[:, 1:, :], length, rate), lambda o: o[1])
    t("detect_only", lambda: jrx.detect_only(xd), lambda o: o[0])
    full = t("rx_pipeline", lambda: jrx.rx_pipeline(xd, rate, max_psdu=max_psdu), lambda o: o["ok"])
    print(f"  sum-of-stages {tot*1e3:.2f} ms vs full {full*1e3:.2f} ms; "
          f"{B*N/full/1e6:.1f} Msamples/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
