"""Multi-device sharding of the PHY pipelines.

Reference parallelism is threads-on-cores inside one host (SURVEY §2.9):
TThreadSeparator pipeline splits, SIMD lanes, dual-radio streams.  The TPU
redesign scales over a `jax.sharding.Mesh` with two named axes:

* ``dp`` — frame/stream parallelism: independent RX streams (the analogue
  of Sora's multiple radios / VStream readers) split across devices.
* ``sp`` — time-block (sequence) parallelism *within* a stream: packet
  search is sample-parallel, so each device scans a contiguous time block
  and exchanges a halo of boundary samples with its right neighbor via
  ``ppermute`` (the overlap-save scheme of SURVEY §5 long-context notes).

Detection runs on the (dp, sp) mesh; frame decode is then resharded to
pure batch parallelism over all devices (XLA inserts the all-to-all), the
same front-end/decoder split the reference realizes with its Viterbi
thread separator (fb11ademod_config.hpp:159) — here the boundary is a
resharding, not a spin-lock ring.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sora_tpu.dsp import filters as df
from sora_tpu.phy import common as C
from sora_tpu.phy.dot11a import rx as arx

# halo: lag-16 autocorr + 64-wide window + 128-long LTS correlation
_HALO = 256


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 1 else 1
    sp = n // dp
    return Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))


def synchronize_sharded(x: jnp.ndarray, mesh: Mesh):
    """Time-block-sharded packet detection with halo exchange.

    x: (B, N) with B sharded over ``dp`` and N sharded over ``sp``.
    Each device computes detection metrics for window starts inside its
    block, pulling _HALO samples from its right neighbor so windows that
    straddle the boundary are scored exactly once.  Global argmax is a
    tiny all-gather of per-block candidates.

    Returns (lts1, cfo) replicated over ``sp``.
    """
    return _sync_sharded_jit(mesh)(x)


@lru_cache(maxsize=None)
def _sync_sharded_jit(mesh: Mesh):
    """Build + jit the sharded sync for one mesh (cached: rebuilding the
    shard_map per call would retrace every time, and an un-jitted
    shard_map dispatches eagerly op by op — unsupported on the axon
    runtime and slow everywhere)."""
    nsp = mesh.shape["sp"]

    def local(xl):
        # xl: (B_local, N_local) — this device's time block
        sp_i = jax.lax.axis_index("sp")
        nloc = xl.shape[1]
        # halo exchange: receive the head of the right neighbor's block
        perm = [(i, (i - 1) % nsp) for i in range(nsp)]
        head = jax.lax.ppermute(xl[:, :_HALO], "sp", perm)
        # the last block's halo wraps around to block 0; zero it instead
        head = jnp.where(sp_i == nsp - 1, 0.0, 1.0) * head
        xx = jnp.concatenate([xl, head], axis=1)
        # STS autocorrelation metric for offsets local to this block
        ac = xx[:, 16:] * jnp.conj(xx[:, :-16])
        w = df.moving_sum(ac, 64)[:, : nloc]
        en = df.moving_sum(jnp.abs(xx[:, :-16]) ** 2, 64)[:, : nloc]
        en = en.astype(jnp.float32)
        # energy gate against the *global* max (one small all-reduce)
        en_max = jax.lax.pmax(jnp.max(en, axis=1), "sp")
        gate = en > 0.05 * en_max[:, None]
        m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
        # match the single-device first-plateau selection: the EARLIEST
        # global offset whose metric reaches 90% of the global max, with
        # offsets too close to the stream end excluded (a full
        # preamble+SIGNAL must still fit)
        nglob = nsp * nloc
        gpos0 = sp_i * nloc + jnp.arange(nloc)[None, :]
        m = jnp.where(gpos0 < max(1, nglob - 480), m, 0.0)
        gmax = jax.lax.pmax(jnp.max(m, axis=1), "sp")     # (B,)
        hit = m >= 0.9 * gmax[:, None]
        first_loc = jnp.argmax(hit, axis=1)
        has = jnp.any(hit, axis=1)
        first_glob = jnp.where(has, sp_i * nloc + first_loc, nglob + 1)
        sts = jax.lax.pmin(first_glob, "sp")              # (B,)
        own = (sts >= sp_i * nloc) & (sts < (sp_i + 1) * nloc)
        loc = jnp.clip(sts - sp_i * nloc, 0, nloc - 1)
        det_l = jnp.where(own, jnp.take_along_axis(m, loc[:, None], 1)[:, 0],
                          0.0)
        det = jax.lax.psum(det_l, "sp")
        w_l = jnp.where(own, jnp.take_along_axis(w, loc[:, None], 1)[:, 0],
                        0.0)
        wsel = jax.lax.psum(w_l, "sp")
        cfo = jnp.angle(wsel).astype(jnp.float32) / 16.0
        # LTS cross-correlation on the de-rotated block (+halo); the ramp
        # phase uses the *global* sample index so blocks line up
        gidx = (sp_i * nloc + jnp.arange(xx.shape[1])).astype(jnp.float32)
        y = xx * jnp.exp(-1j * cfo[:, None] * gidx[None, :])
        c = jnp.abs(df.correlate_stream(y, arx._LTS_SYM))
        c2 = (c[:, :-64] + c[:, 64:])[:, : nloc]
        pos = sp_i * nloc + jnp.arange(nloc)[None, :]
        c2 = jnp.where(pos >= sts[:, None], c2, 0.0)
        lts_loc = jnp.argmax(c2, axis=1)
        lval = jnp.take_along_axis(c2, lts_loc[:, None], 1)[:, 0]
        cand_lv = jax.lax.all_gather(lval, "sp")
        cand_li = jax.lax.all_gather(lts_loc + sp_i * nloc, "sp")
        bl = jnp.argmax(cand_lv, axis=0)
        lts1 = jnp.take_along_axis(cand_li, bl[None], 0)[0]
        return lts1.astype(jnp.int32), cfo, det

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P("dp", "sp"),
        out_specs=(P("dp"), P("dp"), P("dp")),
        # outputs are genuinely sp-replicated (they come from all_gather
        # over sp), but varying-axis inference can't see through argmax
        check_vma=False,
    ))


def synchronize_sharded_11n(x: jnp.ndarray, mesh: Mesh):
    """Time-block-sharded 2x2 HT packet detection: antennas stay device-
    local (the P5 stream axis), time blocks shard over ``sp`` with halo
    exchange, detection statistics are antenna-summed exactly like the
    single-device phy.dot11n.rx.synchronize (TCCA11n, cca_11n.hpp:7).

    x: (B, 2, N) with B over ``dp``, antennas unsharded, N over ``sp``.
    Returns (lts1, cfo, det) replicated over ``sp``.
    """
    return _sync_sharded_11n_jit(mesh)(x)


@lru_cache(maxsize=None)
def _sync_sharded_11n_jit(mesh: Mesh):
    from sora_tpu.phy.dot11n import rx as nrx

    nsp = mesh.shape["sp"]

    def local(xl):
        sp_i = jax.lax.axis_index("sp")
        Bl, A, nloc = xl.shape
        perm = [(i, (i - 1) % nsp) for i in range(nsp)]
        head = jax.lax.ppermute(xl[:, :, :_HALO], "sp", perm)
        head = jnp.where(sp_i == nsp - 1, 0.0, 1.0) * head
        xx = jnp.concatenate([xl, head], axis=2)     # (B, 2, nloc+halo)
        xf = xx.reshape(Bl * A, -1)
        ac = xf[:, 16:] * jnp.conj(xf[:, :-16])
        w = df.moving_sum(ac, 64).reshape(Bl, A, -1).sum(1)[:, :nloc]
        en = df.moving_sum(jnp.abs(xf[:, :-16]) ** 2, 64).astype(
            jnp.float32).reshape(Bl, A, -1).sum(1)[:, :nloc]
        en_max = jax.lax.pmax(jnp.max(en, axis=1), "sp")
        gate = en > 0.05 * en_max[:, None]
        m = jnp.where(gate, jnp.abs(w) / (en + 1e-9), 0.0)
        nglob = nsp * nloc
        gpos = sp_i * nloc + jnp.arange(nloc)[None, :]
        m = jnp.where(gpos < max(1, nglob - 900), m, 0.0)
        gmax = jax.lax.pmax(jnp.max(m, axis=1), "sp")
        hit = m > 0.9 * gmax[:, None]
        first_loc = jnp.argmax(hit, axis=1)
        has = jnp.any(hit, axis=1)
        first_glob = jnp.where(has, sp_i * nloc + first_loc, nglob + 1)
        onset = jax.lax.pmin(first_glob, "sp")
        sts = jnp.minimum(onset + 16, nglob - 1)     # plateau interior
        own = (sts >= sp_i * nloc) & (sts < (sp_i + 1) * nloc)
        loc = jnp.clip(sts - sp_i * nloc, 0, nloc - 1)
        det_l = jnp.where(own,
                          jnp.take_along_axis(m, loc[:, None], 1)[:, 0],
                          0.0)
        det = jax.lax.psum(det_l, "sp")   # antenna-summed plateau quality
        w_l = jnp.where(own, jnp.take_along_axis(w, loc[:, None], 1)[:, 0],
                        0.0)
        wsel = jax.lax.psum(w_l, "sp")
        cfo = jnp.angle(wsel).astype(jnp.float32) / 16.0
        gidx = (sp_i * nloc
                + jnp.arange(xx.shape[2])).astype(jnp.float32)
        y = (xx * jnp.exp(-1j * cfo[:, None, None] * gidx[None, None, :])
             ).reshape(Bl * A, -1)
        c = jnp.abs(df.correlate_stream(y, nrx._LTS_SYM)).reshape(
            Bl, A, -1).sum(1)
        c2 = (c[:, :-64] + c[:, 64:])[:, :nloc]
        pos = sp_i * nloc + jnp.arange(nloc)[None, :]
        inwin = (pos >= sts[:, None]) & (pos <= sts[:, None] + 320)
        c2 = jnp.where(inwin, c2, 0.0)
        lts_loc = jnp.argmax(c2, axis=1)
        lval = jnp.take_along_axis(c2, lts_loc[:, None], 1)[:, 0]
        cand_lv = jax.lax.all_gather(lval, "sp")
        cand_li = jax.lax.all_gather(lts_loc + sp_i * nloc, "sp")
        bl = jnp.argmax(cand_lv, axis=0)
        lts1 = jnp.take_along_axis(cand_li, bl[None], 0)[0]
        return lts1.astype(jnp.int32), cfo, det

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P("dp", None, "sp"),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    ))


def rx_pipeline_sharded_11n(x: jnp.ndarray, mesh: Mesh, mcs: int,
                            max_psdu: int = 256, input_rate: str = "20m"):
    """Full sharded 2x2 HT RX: (dp, antenna-local, sp) detection, then
    MIMO decode resharded batch-parallel over every device — extends the
    11a sharding to the 11n pipeline (fb11ndemod_config.hpp:142-206).
    ONE jit program: the detect->decode reshard is a sharding constraint
    XLA lowers to an all-to-all, not a host-driven device_put (which
    costs a full dispatch round trip per stage on a tunnel-attached
    chip)."""
    xs = _shard_in(x, mesh, input_rate, P("dp", None, "sp"),
                   P("dp", None, "sp", None))
    return _sharded_11n_fixed(mesh, mcs, max_psdu)(xs)


@lru_cache(maxsize=None)
def _sharded_11n_fixed(mesh: Mesh, mcs: int, max_psdu: int):
    from sora_tpu.phy.dot11n import rx as nrx

    sync = _sync_sharded_11n_jit(mesh)
    all_axes = NamedSharding(mesh, P(("dp", "sp"), None, None))
    bspec = NamedSharding(mesh, P(("dp", "sp")))
    nsym = nrx.max_symbols(mcs, max_psdu)
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def run(xb):
        lts1, cfo, dt = sync(xb)
        xd = wsc(xb, all_axes)
        l1, cf, dt = (wsc(v, bspec) for v in (lts1, cfo, dt))
        sig_eq, xdet, snr_db, wgt = nrx.extract_symbols(
            xd, l1, cf, nsym, return_weights=True)
        lsig_ok = nrx.decode_lsig(sig_eq[:, 0])
        mcs_rx, length, htsig_ok, sgi_rx = nrx.decode_htsig(sig_eq[:, 1:])
        length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
        psdu, fcs_ok = nrx.decode_data(xdet, length, mcs, max_psdu, wgt)
        cs_ok = dt >= nrx.CS_DET_THRESHOLD
        ok = cs_ok & lsig_ok & htsig_ok & (mcs_rx == mcs) & fcs_ok
        return {"psdu": psdu, "ok": ok.astype(jnp.uint8),
                "fcs_ok": fcs_ok.astype(jnp.uint8),
                "cs_ok": cs_ok.astype(jnp.uint8), "det": dt,
                "mcs": mcs_rx.astype(jnp.int32),
                "length": length, "snr_db": snr_db}

    return run


def _shard_in(x, mesh: Mesh, input_rate: str, spec, host_spec):
    """Put a host/device stream batch onto the mesh, running the 40 Msps
    front end batch-parallel over all devices first when asked (the
    TDownSample2 -> TDCRemoveEx graph head, fb11ademod_config.hpp:148)."""
    if isinstance(x, jax.Array):
        # already device-resident (committed or not): device_put below
        # reshards it; routing it through device_complex would FETCH a
        # complex array to the host, which the axon runtime cannot do
        xs = x
    else:
        # host arrays cross the boundary as float32 (re, im) pairs — the
        # axon TPU runtime cannot transfer complex64 (sora_tpu.util.xfer)
        from sora_tpu.util.xfer import device_complex
        xs = device_complex(x, NamedSharding(mesh, host_spec))
    if input_rate == "40m":
        from sora_tpu.phy import frontend as fe
        nb = ("dp", "sp")
        ba = NamedSharding(mesh, P(nb, *([None] * (xs.ndim - 1))))
        xs = jax.device_put(xs, ba)
        if xs.ndim == 3:                        # (B, 2, N) MIMO
            B2, A, N = xs.shape
            xs = fe.ofdm_frontend_40m(xs.reshape(B2 * A, N)
                                      ).reshape(B2, A, -1)
        else:
            xs = fe.ofdm_frontend_40m(xs)
    return jax.device_put(xs, NamedSharding(mesh, spec))


def rx_pipeline_sharded(x: jnp.ndarray, mesh: Mesh, rate_mbps: int,
                        max_psdu: int = 256, input_rate: str = "20m"):
    """Full sharded RX: (dp, sp)-sharded detection, then frame decode
    resharded to batch-parallel over every device.

    x: (B, N) complex64 on host or device; B must divide by the full
    device count.  ``input_rate="40m"`` runs the device front end
    batch-parallel first.  Returns the rx_pipeline result dict,
    batch-sharded.
    """
    xs = _shard_in(x, mesh, input_rate, P("dp", "sp"),
                   P("dp", "sp", None))
    return _sharded_a_fixed(mesh, rate_mbps, max_psdu)(xs)


@lru_cache(maxsize=None)
def _sharded_a_fixed(mesh: Mesh, rate_mbps: int, max_psdu: int):
    """One-jit fixed-rate sharded pipeline: the detect->decode reshard
    is a sharding constraint (XLA inserts the all-to-all) instead of a
    host-driven device_put per stage — on a tunnel-attached chip every
    eager stage costs a full dispatch round trip."""
    sync = _sync_sharded_jit(mesh)
    all_axes = NamedSharding(mesh, P(("dp", "sp"), None))
    bspec = NamedSharding(mesh, P(("dp", "sp")))
    rate = C.RATES[rate_mbps]
    nsym = arx.max_symbols(rate, max_psdu)
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def run(xb):
        lts1, cfo, _det = sync(xb)
        xd = wsc(xb, all_axes)
        l1, cf = wsc(lts1, bspec), wsc(cfo, bspec)
        eq, snr_db, wgt = arx.extract_symbols(xd, l1, cf, nsym,
                                              return_weights=True)
        rate_bits, length, sig_ok = arx.decode_signal(eq[:, 0, :])
        length = jnp.clip(length, 0, max_psdu).astype(jnp.int32)
        psdu, fcs_ok, _ = arx.decode_data(eq[:, 1:, :], length, rate_mbps,
                                          wgt)
        ok = sig_ok & (rate_bits == rate.rate_bits) & fcs_ok
        return {"psdu": psdu, "ok": ok.astype(jnp.uint8),
                "fcs_ok": fcs_ok.astype(jnp.uint8),
                "length": length, "snr_db": snr_db}

    return run


def rx_pipeline_sharded_auto(x: jnp.ndarray, mesh: Mesh,
                             max_psdu: int = 256,
                             input_rate: str = "20m"):
    """Sharded mixed-rate RX: (dp, sp) detection with halo exchange,
    then the runtime rate-dispatch decode tail (phy.dot11a.rx.auto_tail)
    batch-parallel over every device — sharded parity with the
    single-device rx_pipeline_auto (VERDICT r02 item 8).

    x: (B, N) complex64 (raw 40 Msps with ``input_rate="40m"``);
    B must divide by the full device count.
    """
    xs = _shard_in(x, mesh, input_rate, P("dp", "sp"),
                   P("dp", "sp", None))
    return _sharded_a_auto(mesh, max_psdu, int(xs.shape[-1]))(xs)


@lru_cache(maxsize=None)
def _sharded_a_auto(mesh: Mesh, max_psdu: int, n_samples: int):
    sync = _sync_sharded_jit(mesh)
    all_axes = NamedSharding(mesh, P(("dp", "sp"), None))
    bspec = NamedSharding(mesh, P(("dp", "sp")))
    nsym_win = max(1, (n_samples - 208) // 80)
    nsym_max = arx._auto_tables(max_psdu, nsym_win)[3]
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def run(xb):
        lts1, cfo, det = sync(xb)
        xd = wsc(xb, all_axes)
        l1, cf, dt = (wsc(v, bspec) for v in (lts1, cfo, det))
        eq, snr_db, wgt = arx.extract_symbols(xd, l1, cf, nsym_max,
                                              return_weights=True)
        out = arx.auto_tail(eq, dt, max_psdu, nsym_win, weights=wgt)
        out["snr_db"] = snr_db
        return out

    return run


def rx_pipeline_sharded_11n_auto(x: jnp.ndarray, mesh: Mesh,
                                 max_psdu: int = 256,
                                 input_rate: str = "20m"):
    """Sharded mixed-MCS 2x2 HT RX: antenna-local (dp, sp) detection,
    then the runtime MCS-dispatch ZF decode tail
    (phy.dot11n.rx.auto_tail) batch-parallel over every device."""
    xs = _shard_in(x, mesh, input_rate, P("dp", None, "sp"),
                   P("dp", None, "sp", None))
    return _sharded_11n_auto(mesh, max_psdu, int(xs.shape[-1]))(xs)


@lru_cache(maxsize=None)
def _sharded_11n_auto(mesh: Mesh, max_psdu: int, n_samples: int):
    from sora_tpu.phy.dot11n import rx as nrx

    sync = _sync_sharded_11n_jit(mesh)
    all_axes = NamedSharding(mesh, P(("dp", "sp"), None, None))
    bspec = NamedSharding(mesh, P(("dp", "sp")))
    nsym_win = max(1, (n_samples - nrx._OFF_DATA) // 80)
    nsym_max = nrx._auto_tables_n(max_psdu, nsym_win)[3]
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def run(xb):
        lts1, cfo, det = sync(xb)
        xd = wsc(xb, all_axes)
        l1, cf, dt = (wsc(v, bspec) for v in (lts1, cfo, det))
        sig_eq, xdet, snr_db, wgt = nrx.extract_symbols(
            xd, l1, cf, nsym_max, return_weights=True)
        out = nrx.auto_tail(sig_eq, xdet, dt, max_psdu, nsym_win,
                            weights=wgt)
        out["snr_db"] = snr_db
        return out

    return run


def rx_pipeline_sharded_11b(x: jnp.ndarray, mesh: Mesh,
                            max_psdu: int = 256):
    """Sharded DSSS RX: the Barker chip-rate correlation — the dominant
    per-chip compute of the 11b chain — runs (dp, sp)-sharded with a
    16-chip halo exchange, then the mixed-rate decode tail
    (phy.dot11b.rx.auto_tail: onset/fold sync, PLCP, PSK/CCK decode)
    runs batch-parallel over every device.  Completes "every PHY
    sharded" (the reference parallelized 11b like 11a,
    fb11bdemod_config.hpp:92-142).

    x: (B, N) complex64 chips at 11 Msps; B must divide by the device
    count.  Returns the rx_pipeline_auto dict, batch-sharded.
    """
    xs = _shard_in(x, mesh, "11m", P("dp", "sp"), P("dp", "sp", None))
    return _sharded_b_auto(mesh, max_psdu)(xs)


@lru_cache(maxsize=None)
def _sharded_b_auto(mesh: Mesh, max_psdu: int):
    from sora_tpu.phy.dot11b import rx as brx

    corr = _corr_sharded_11b_jit(mesh)
    batch_all = NamedSharding(mesh, P(("dp", "sp"), None))
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def run(xb):
        cg = corr(xb)                       # (B, N), (dp, sp)-sharded
        n = int(xb.shape[1]) - 10           # correlate_stream's length
        xb2 = wsc(xb, batch_all)
        c2 = wsc(cg[:, :n], batch_all)
        return brx.auto_tail(xb2, c2, max_psdu)

    return run


@lru_cache(maxsize=None)
def _corr_sharded_11b_jit(mesh: Mesh):
    """(dp, sp)-sharded Barker correlation with a 16-chip halo from the
    right neighbor (the 11-chip pattern spans 10 chips past a block
    boundary); the last block zero-fills, matching the unsharded
    correlate_stream once the surplus tail is sliced off."""
    from sora_tpu.phy import dot11b_common as B11

    nsp = mesh.shape["sp"]
    HB = 16

    def local(xl):
        sp_i = jax.lax.axis_index("sp")
        perm = [(i, (i - 1) % nsp) for i in range(nsp)]
        head = jax.lax.ppermute(xl[:, :HB], "sp", perm)
        head = jnp.where(sp_i == nsp - 1, 0.0, 1.0) * head
        xx = jnp.concatenate([xl, head], axis=1)
        cl = df.correlate_stream(xx, B11.BARKER.astype(np.complex64))
        return cl[:, : xl.shape[1]]

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=P("dp", "sp"),
        out_specs=P("dp", "sp"),
    ))
