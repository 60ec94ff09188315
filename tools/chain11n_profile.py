"""Deep-pipelined per-stage profile of the 11n MCS15 chain."""
import sys, time
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from sora_tpu.util.platform import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    from sora_tpu.phy.dot11n import rx as nrx
    from sora_tpu.golden import dot11n_np as gn
    from sora_tpu.mac import frame as fr
    from sora_tpu.util.xfer import device_complex

    rng = np.random.default_rng(6)
    psdu = fr.build_data_frame(bytes(rng.integers(0, 256, 1472, dtype=np.uint8)), seq=3)
    wave = gn.modulate(psdu, 15).astype(np.complex64)
    B, N = 64, wave.shape[1] + 400
    x = np.zeros((B, 2, N), np.complex64)
    for i in range(B):
        off = 30 + (7 * i) % 300
        x[i, :, off: off + wave.shape[1]] = wave
    x += (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape)).astype(np.complex64) * 0.02
    xd = device_complex(x)
    max_psdu = 1504
    lts1, cfo, det = nrx.synchronize(xd)
    nsym = nrx.max_symbols(15, max_psdu)
    sig_eq, xdet, snr = nrx.extract_symbols(xd, lts1, cfo, nsym)
    length = jnp.full((B,), 1500, jnp.int32)

    def t(name, f, sync, reps=60):
        o = f(); np.asarray(sync(o))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f()
        np.asarray(sync(o))
        dt = (time.perf_counter()-t0)/reps
        print(f"  {name:18s} {dt*1e3:7.2f} ms", flush=True)
        return dt

    t("synchronize", lambda: nrx.synchronize(xd), lambda o: o[2])
    t("extract_symbols", lambda: nrx.extract_symbols(xd, lts1, cfo, nsym), lambda o: o[2])
    t("decode_lsig", lambda: nrx.decode_lsig(sig_eq[:, 0]), lambda o: o)
    t("decode_htsig", lambda: nrx.decode_htsig(sig_eq[:, 1:]), lambda o: o[2])
    t("decode_data", lambda: nrx.decode_data(xdet, length, 15, max_psdu), lambda o: o[1])
    full = t("rx_pipeline", lambda: nrx.rx_pipeline(xd, 15, max_psdu=max_psdu), lambda o: o["ok"])
    print(f"  -> {B*N/full/1e6:.1f} Msamples/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
