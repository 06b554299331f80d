"""Session engine: source + GF store + receivers -> seismograms -> misfits.

The TPU-native counterpart of minimizer_engine.f90: one object holds the
configured database, receiver set, source, misfit setup, and produces
synthetic seismograms and misfits.  Instead of the reference's dirty-flag
recompute chain over mutable Fortran state, configuration changes invalidate
a compiled "plan" (static window/probe geometry + jitted forward); source
parameter changes are just new inputs to the same compiled program, and a
whole batch of sources is evaluated in one device call (the reference
evaluates sources strictly serially, seismosizer.py:703-718 -- this batching
is where the TPU speedup lives).

Units at this API: latitudes/longitudes in degrees (like the reference's
receiver files and set_source_location command), distances/depths in meters,
times in seconds.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import misfit as mf
from . import synth
from .gf.store import GFStore
from .gf.trace import dataspan, fnint
from .ops import synth_window
from .plf import PLF
from .sources import get_source_model


def _on_tpu():
    """True when the default device is real TPU hardware.  The backend
    PLATFORM name is not reliably "tpu" (the axon tunnel registers as
    "axon"); the device kind is."""
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001
        return False

F32 = jnp.float32


@dataclasses.dataclass
class Receiver:
    lat_deg: float
    lon_deg: float
    components: str  # e.g. "ned" (receiver.f90:35-56)
    depth: float = 0.0
    enabled: bool = True
    name: str = ""


class Engine:
    """A minimizer session (single controller, device-resident data)."""

    def __init__(self, store: GFStore | None = None):
        self.store = store
        self.receivers: list[Receiver] = []
        self.src_lat_deg = None
        self.src_lon_deg = None
        self.ref_time = 0.0
        self.source_type = None
        self.source_params = None
        self.effective_dt = 1.0
        self.misfit_method = mf.L2NORM
        self.interpolate = False
        self.xunder = 1
        self.zunder = 1
        self.synthetics_factor = 1.0
        self.floating_shiftrange_s = (0.0, 0.0)
        self.crustal_thickness_limit = 0.0
        self._user_constraints = None
        # host-side reference traces / tapers / filters, keyed by rc row
        self._refs: dict = {}  # irc -> (values f32[n], itmin int)
        self._tapers: dict = {}  # irc -> PLF
        self._filters: dict = {}  # irc -> PLF
        self._plan = None
        self._plan_key = None
        self._disc_cache = {}
        self._sweep_memo = {}
        self.memory_budget = 4 << 30  # transient bytes per device call
        self.force_path = None  # ("conv"|"direct", group_size) debug override
        # batched eikonal discretization on device (anti-diagonal fast
        # sweeping) instead of serial host FMM -- ~70x faster for finite
        # eikonal grid searches.  The first batch of each new plan shape
        # cross-checks several randomly chosen members against the host FMM
        # pipeline (the CLI oracle) and falls back with a warning if any
        # disagrees beyond f32 roundoff.
        self.eikonal_device = True
        self._eikonal_checked_keys = set()
        # device-table calibration: (model, NF, NC, dt) -> (ntmax, ncell
        # budget, hard ntmax bound).  The bounding-box x worst-case-duration
        # table is ~6x larger than what the rupture actually needs; the
        # budgets are calibrated from the host-oracle tables of the first
        # batch's most demanding members and guarded by the discretizer's
        # async overflow counter (checked one batch later, sync-free).
        self._eik_calib = {}
        self._eik_pending = []
        # optional floor on the pow2 probe length (spectral-filter
        # grid pinning; see _make_plan)
        self.min_probe_length = 0
        # (per_source_bytes estimates are TPU-pad-aware; a v5e chip has
        # ~16 GB HBM, leaving headroom for the GF window + misfit probes)

    # -- configuration (each invalidates the compiled plan as needed) --------

    def set_database(self, store: GFStore):
        self.store = store
        self._invalidate()

    def set_local_interpolation(self, on: bool):
        self.interpolate = bool(on)
        self._invalidate()

    def set_spacial_undersampling(self, xunder: int, zunder: int):
        if xunder < 1 or zunder < 1:
            raise ValueError("invalid undersampling value")
        self.xunder, self.zunder = int(xunder), int(zunder)
        self._invalidate()

    def set_receivers(self, receivers: list[Receiver]):
        self.receivers = list(receivers)
        self._refs.clear()
        self._tapers.clear()
        self._filters.clear()
        self._invalidate()

    def switch_receiver(self, irec: int, on: bool):
        self.receivers[irec].enabled = bool(on)
        self._invalidate()

    def set_source_location(self, lat_deg, lon_deg, ref_time=0.0):
        self.src_lat_deg = float(lat_deg)
        self.src_lon_deg = float(lon_deg)
        self.ref_time = float(ref_time)
        self._invalidate()

    def set_source_constraints(self, points, normals):
        """Explicit rupture constraints (minimizer_engine.f90:469-477);
        points/normals: [N, 3] arrays in NED meters."""
        self._user_constraints = [
            (np.asarray(p, np.float64), np.asarray(n, np.float64))
            for p, n in zip(points, normals)
        ]

    def set_source_crustal_thickness_limit(self, limit):
        self.crustal_thickness_limit = float(limit)

    def source_constraints(self):
        """Active constraint half-spaces: user-set, or the defaults from
        crust2x2 (psm_set_default_constraints, parameterized_source.f90:
        127-145): surface at z >= 1500 m and the crust bottom."""
        if self._user_constraints is not None:
            return list(self._user_constraints)
        from .crust2x2 import default_model

        m = default_model()
        vp, vs, rho, th, _elev = m.profile(self.src_lat_deg, self.src_lon_deg)
        _vvp, _vvs, _vrho, thickness = m.profile_averages(vp, vs, rho, th)
        if self.crustal_thickness_limit > 0:
            thickness = min(self.crustal_thickness_limit, thickness)
        return [
            (np.array([0.0, 0.0, 1500.0]), np.array([0.0, 0.0, -1.0])),
            (np.array([0.0, 0.0, thickness]), np.array([0.0, 0.0, 1.0])),
        ]

    def eikonal_context(self):
        from .crust2x2 import default_model
        from .sources.eikonal import EikonalContext

        m = default_model()
        depths, _vp, vs, _rho = m.layers_at(self.src_lat_deg, self.src_lon_deg)
        return EikonalContext(
            constraints=self.source_constraints(),
            layer_depths=depths,
            layer_vs=vs,
        )

    def get_source_crustal_thickness(self):
        from .crust2x2 import default_model

        m = default_model()
        vp, vs, rho, th, _elev = m.profile(self.src_lat_deg, self.src_lon_deg)
        _vvp, _vvs, _vrho, thickness = m.profile_averages(vp, vs, rho, th)
        if self.crustal_thickness_limit > 0:
            thickness = min(self.crustal_thickness_limit, thickness)
        return thickness

    def set_source_params(self, source_type: str, params):
        self.source_type = source_type
        self.source_params = np.asarray(params, dtype=np.float32)
        model = get_source_model(source_type)
        if self.source_params.shape != (model.nparams,):
            raise ValueError(
                f"{source_type} needs {model.nparams} params, got {self.source_params.shape}"
            )

    def set_effective_dt(self, dt):
        self.effective_dt = float(dt)

    def set_misfit_method(self, method):
        self.misfit_method = mf.NORM_NAMES[method] if isinstance(method, str) else int(method)
        self._invalidate()

    def set_misfit_taper(self, irec, x, y):
        plf = PLF(x, y)
        for irc, (r, _c) in enumerate(self._rc_layout()):
            if r == irec:
                self._tapers[irc] = plf
        self._invalidate()

    def set_misfit_filter(self, irec, x, y):
        """irec = None applies to all receivers (minimizer_engine.f90:632-666)."""
        plf = PLF(x, y)
        for irc, (r, _c) in enumerate(self._rc_layout()):
            if irec is None or r == irec:
                self._filters[irc] = plf
        self._invalidate()

    def set_synthetics_factor(self, factor):
        self.synthetics_factor = float(factor)
        self._invalidate()

    def set_floating_shiftrange(self, tmin, tmax, irec=None):
        """Allowed reference shift range for floating norms; irec=None sets
        all receivers (set_floating_shiftrange, minimizer_engine.f90:421-451)."""
        if irec is None:
            self.floating_shiftrange_s = (float(tmin), float(tmax))
            self._per_rec_shiftrange = {}
        else:
            if not hasattr(self, "_per_rec_shiftrange"):
                self._per_rec_shiftrange = {}
            self._per_rec_shiftrange[int(irec)] = (float(tmin), float(tmax))
            lo = min(self.floating_shiftrange_s[0], float(tmin))
            hi = max(self.floating_shiftrange_s[1], float(tmax))
            self.floating_shiftrange_s = (lo, hi)
        self._invalidate()

    def set_ref_seismogram(self, irec, comp_char, values, itmin):
        """Install a reference trace for (receiver, component); itmin is the
        absolute sample index of the first value (time = itmin*dt)."""
        for irc, (r, c) in enumerate(self._rc_layout()):
            if r == irec and c == comp_char:
                self._refs[irc] = (np.asarray(values, np.float32), int(itmin))
                self._invalidate()
                return
        raise KeyError(f"receiver {irec} has no component {comp_char!r}")

    # -- internals ------------------------------------------------------------

    def _invalidate(self):
        self._plan = None
        self._plan_key = None
        self._sweep_memo = {}

    def _rc_layout(self):
        """[(irec, comp_char)] rows in receiver-major order."""
        out = []
        for irec, r in enumerate(self.receivers):
            for c in r.components:
                out.append((irec, c))
        return out

    def _require_ready(self):
        if self.store is None:
            raise RuntimeError("no database set")
        if not self.receivers:
            raise RuntimeError("no receivers set")
        if self.src_lat_deg is None:
            raise RuntimeError("no source location set")

    def _geometry(self):
        lats = np.radians([r.lat_deg for r in self.receivers])
        lons = np.radians([r.lon_deg for r in self.receivers])
        depths = np.array([r.depth for r in self.receivers])
        return synth.precompute_receiver_geometry(
            np.radians(self.src_lat_deg), np.radians(self.src_lon_deg), lats, lons, depths
        )

    @staticmethod
    def _bucket(value, step):
        return float(np.ceil(max(value, step) / step) * step)

    def _centroid_stats(self, cbatch):
        """Conservative host bounds from a discretized centroid batch."""
        act = np.asarray(cbatch["active"])
        if not act.any():
            raise ValueError("no active centroids in source batch")
        dn = np.asarray(cbatch["north"], np.float64)[act]
        de = np.asarray(cbatch["east"], np.float64)[act]
        depth = np.asarray(cbatch["depth"], np.float64)[act]
        t = np.asarray(cbatch["time"], np.float64)[act]
        return (
            float(np.hypot(dn, de).max()),
            (float(depth.min()), float(depth.max())),
            (float(t.min()), float(t.max())),
        )

    def _make_plan(self, extent, depth_range, time_range, risetime_max, nshape,
                   gsize=1):
        self._require_ready()
        store = self.store
        geom = self._geometry()
        cfg = synth.plan_config(
            store, geom, extent, depth_range, time_range,
            interpolate=self.interpolate, xunder=self.xunder, zunder=self.zunder,
        )
        gfd, gfi = synth.window_arrays(store, cfg)
        sl = np.s_[cfg.ix0 : cfg.ix0 + cfg.nxw, cfg.iz0 : cfg.iz0 + cfg.nzw]
        gfn = jnp.asarray(store.nsamples[sl])

        # formulation choice is shared with parallel/gfshard so the sharded
        # forward picks the same path as the unsharded plan
        ncent = int(np.prod(nshape))
        form = synth.choose_formulation(cfg, ncent, gsize, len(self.receivers),
                                        force=self.force_path)
        path, group_size = form.path, form.group_size
        per_source_bytes = form.per_source_bytes
        # one jit per helper: eagerly these dispatch dozens of small ops,
        # each a compile+dispatch round trip over the device tunnel
        ext = jax.jit(synth.materialize_window, static_argnums=2)(gfd, gfi, cfg)

        fold_max = int(np.ceil(0.5 * risetime_max / store.dt)) + 1 if risetime_max > 0 else 0

        # probe span: union of the synthesis window and every reference trace
        lo = cfg.out_it0 - fold_max
        hi = cfg.out_it0 + cfg.nt_out - 1 + fold_max
        maxreflen = 1
        s1 = int(fnint(np.float32(self.floating_shiftrange_s[0]) / np.float32(store.dt)))
        s2 = int(fnint(np.float32(self.floating_shiftrange_s[1]) / np.float32(store.dt)))
        for irc, (values, itmin) in self._refs.items():
            lo = min(lo, itmin + s1)
            hi = max(hi, itmin + len(values) - 1 + s2)
            maxreflen = max(maxreflen, len(values))
        # min_probe_length: optional floor on the pow2 probe length.  The
        # reference grows probes lazily per content (comparator.f90:
        # 1092-1118), so the exact pow2 size is implementation-path
        # dependent -- but spectral-filter weights are evaluated at
        # k/(pl*dt), so cross-implementation FILTER parity (e.g. against
        # the C++ oracle, tests/test_golden_oracle.py) needs a common grid
        minlength = max(2 * max(cfg.nt_out, maxreflen),
                        getattr(self, "min_probe_length", 0))
        ps0, ps1 = mf.allowed_span((lo, hi), minlength)
        st = mf.ProbeStatic(ps0=ps0, pl=ps1 - ps0 + 1, dt=store.dt)

        layout = self._rc_layout()
        rc_rec = np.array([r for r, _ in layout], dtype=np.int32)
        rc_chan = np.array(
            [abs(synth.COMPONENT_IDS[c]) - 1 for _, c in layout], dtype=np.int32
        )
        rc_sign = np.array(
            [np.sign(synth.COMPONENT_IDS[c]) for _, c in layout], dtype=np.float32
        )
        span_of_chan = np.array([0, 1, 2, 0, 0], dtype=np.int32)

        setup = mf.MisfitSetup(st, rc_rec)
        for irc, (values, itmin) in self._refs.items():
            setup.set_ref(irc, values, itmin)
        for irc, plf in self._tapers.items():
            setup.set_taper(irc, plf)
        for irc, plf in self._filters.items():
            setup.set_filter(irc, plf)
        setup.syn_factor[:] = self.synthetics_factor
        per_rec = getattr(self, "_per_rec_shiftrange", {})
        for irc, (r, _c) in enumerate(layout):
            setup.enabled[irc] = self.receivers[r].enabled
            tmin, tmax = per_rec.get(r, self.floating_shiftrange_s)
            setup.shift_lo[irc] = int(fnint(np.float32(tmin) / np.float32(store.dt)))
            setup.shift_hi[irc] = int(fnint(np.float32(tmax) / np.float32(store.dt)))
        ctx = setup.device()

        # static union window for the time-domain misfit sums: every
        # possible norm span (ref spans under all floating shifts, the
        # synthesis window +- fold, GF-data-derived synthetic spans,
        # taper spans) lies inside it, so evaluate_misfits can integrate
        # over this slice instead of the full FFT-padded probe (~2x less
        # eval traffic; masks are identical on the slice)
        gfi_np = np.asarray(store.itmin[sl])
        gfn_np = np.asarray(store.nsamples[sl])
        w0 = min(lo, int(gfi_np.min()) + cfg.s_base - 1 - fold_max)
        w1 = max(hi, int((gfi_np + gfn_np).max()) + cfg.s_base + cfg.s_len
                 + 1 + fold_max)
        if setup.has_taper.any():
            w0 = min(w0, int(setup.taper_lo[setup.has_taper].min()))
            w1 = max(w1, int(setup.taper_hi[setup.has_taper].max()))
        eval_win = (max(w0, st.ps0), min(w1, st.ps0 + st.pl - 1))

        recs = self._geometry().device()
        nrec = len(self.receivers)
        method = self.misfit_method
        shiftrange = (s1, s2)
        any_taper = bool(setup.has_taper.any())
        any_filter = bool(setup.has_filter.any())
        rctx = mf.precompute_ref_context(ctx, method, st, shiftrange, any_taper, any_filter)

        rc_rec_j = jnp.asarray(rc_rec)
        rc_chan_j = jnp.asarray(rc_chan)
        rc_sign_j = jnp.asarray(rc_sign)
        span_idx_j = jnp.asarray(span_of_chan[rc_chan])
        span_tab_xla = jax.jit(synth.span_tables, static_argnums=2)(gfi, gfn, cfg)

        # uniform rc layout (every receiver contributes the same number of
        # rows, rec-major): the shared-kinematics forward can then fold the
        # backazimuth rotation into the moment weights and emit syn_rc by a
        # reshape -- no 5-channel canon materialization, no gather
        rc_k = len(rc_rec) // max(nrec, 1)
        rc_uniform = (
            nrec > 0 and len(rc_rec) % nrec == 0
            and (rc_rec == np.repeat(np.arange(nrec), rc_k)).all()
        )
        if rc_uniform:
            rc_chan_rk = jnp.asarray(rc_chan.reshape(nrec, rc_k))
            rc_sign_rk = jnp.asarray(rc_sign.reshape(nrec, rc_k))

        # batched floating-shift scan kernel (ops/float_scan.py): one pass
        # over each synthetic instead of S = 2*nshift+1 HBM re-reads.  Only
        # for no-filter plans (its mask-free tail decomposition needs
        # constant span tails); KIWI_FLOAT_SCAN=0 falls back to the vmapped
        # XLA evaluation, CPU tests opt in via KIWI_FLOAT_SCAN_INTERPRET=1.
        use_fscan = (
            method in (mf.FLOATING_L2NORM, mf.FLOATING_L1NORM)
            and not any_filter
            and os.environ.get("KIWI_FLOAT_SCAN", "1") != "0"
            and (_on_tpu() or os.environ.get("KIWI_FLOAT_SCAN_INTERPRET") == "1")
        )

        def eval_batch(syn_rc_b, lo_b, hi_b, moments, risetimes):
            """Batched misfit eval: the floating scan kernel when usable,
            else the per-source evaluation under vmap."""
            if use_fscan:
                return mf.evaluate_misfits_floating_batch(
                    ctx, syn_rc_b, cfg.out_it0, lo_b, hi_b, method, st, nrec,
                    moments, risetimes, fold_nshift_max=fold_max, rctx=rctx,
                    shiftrange=shiftrange, any_taper=any_taper,
                    eval_win=eval_win, interpret=not _on_tpu(),
                )

            def eval_one(syn, lo1, hi1, moment, risetime):
                return mf.evaluate_misfits(
                    ctx, syn, cfg.out_it0, lo1, hi1, method, st, nrec,
                    moment=moment, risetime=risetime,
                    fold_nshift_max=fold_max, shiftrange=shiftrange,
                    rctx=rctx, any_taper=any_taper, any_filter=any_filter,
                    eval_win=eval_win,
                )

            lo_b = jnp.broadcast_to(
                jnp.atleast_2d(lo_b), syn_rc_b.shape[:2])
            hi_b = jnp.broadcast_to(
                jnp.atleast_2d(hi_b), syn_rc_b.shape[:2])
            return jax.vmap(eval_one)(syn_rc_b, lo_b, hi_b, moments, risetimes)

        def synth_rc(cent):
            """One source -> component traces + spans: f32[RC, nt_out]."""
            def per_rec(rec):
                ard, lo_, hi_ = synth.synthesize_with_spans(
                    ext, gfi, gfn, cfg, rec, cent, gf_data=gfd, path=path,
                    group_size=group_size, span_tab=span_tab_xla,
                )
                canon = synth.ard_to_components(ard, rec["bazi"], (1, 2, 3, 4, 5))
                return canon, lo_, hi_

            # vmap over the receiver arrays directly: indexing them with a
            # vmapped arange lowers to per-element gathers that TPU XLA
            # executes orders of magnitude slower than a plain mapped axis
            canon, los, his = jax.vmap(per_rec)(recs)
            syn_rc = canon[rc_rec_j, rc_chan_j] * rc_sign_j[:, None]
            lo_rc = los[rc_rec_j, span_idx_j]
            hi_rc = his[rc_rec_j, span_idx_j]
            return syn_rc, lo_rc, hi_rc

        def forward_one(cent, moment, risetime):
            syn_rc, lo_rc, hi_rc = synth_rc(cent)
            return mf.evaluate_misfits(
                ctx, syn_rc, cfg.out_it0, lo_rc, hi_rc, method, st, nrec,
                moment=moment, risetime=risetime, fold_nshift_max=fold_max,
                shiftrange=shiftrange, rctx=rctx,
                any_taper=any_taper, any_filter=any_filter,
                eval_win=eval_win,
            )

        forward_batch_raw = jax.vmap(forward_one)

        # VMEM-resident-window Pallas kernel for the finite-source regime:
        # the vmapped XLA path above materializes per-centroid gather/slice
        # buffers in HBM (~60x off roofline, measured 53 ms device for a
        # 64x10x195 bilateral batch vs the kernel's 10.6 ms).  Gated by
        # choose_formulation; CPU tests opt in via interpret mode
        # (KIWI_WINDOW_INTERPRET=1), KIWI_WINDOW=0 disables.
        gw = max(group_size, 1)
        use_window = form.use_window
        if use_window:
            ext_flat = jax.jit(
                synth_window.pack_ext, static_argnums=1
            )(ext, cfg)
            interp = not _on_tpu()
            span_tab = span_tab_xla

            def forward_batch_window(cbatch, moments, risetimes):
                def kin_one(cent):
                    return jax.vmap(
                        lambda rec: synth._centroid_kinematics(cfg, rec, cent)
                    )(recs)

                kin = jax.vmap(kin_one)(cbatch)  # leaves [B, R, C, ...]
                ard = synth_window.synthesize_ard_batch(
                    ext_flat, cfg, kin, gw, interpret=interp
                )  # [B, R, 3, nt_out]
                lo, hi = jax.vmap(
                    jax.vmap(
                        lambda k: synth.physical_spans_from_tables(span_tab, cfg, k)
                    )
                )(kin)  # [B, R, 3]
                canon = jax.vmap(
                    lambda ab: jax.vmap(
                        lambda a, bz: synth.ard_to_components(a, bz, (1, 2, 3, 4, 5))
                    )(ab, recs["bazi"])
                )(ard)  # [B, R, 5, nt_out]
                syn_rc = canon[:, rc_rec_j, rc_chan_j] * rc_sign_j[None, :, None]
                lo_rc = lo[:, rc_rec_j, span_idx_j]
                hi_rc = hi[:, rc_rec_j, span_idx_j]
                return eval_batch(syn_rc, lo_rc, hi_rc, moments, risetimes)

            forward_batch_raw_xla = forward_batch_raw
            forward_batch_raw = forward_batch_window
        else:
            forward_batch_raw_xla = forward_batch_raw
        max_chunk = form.max_chunk
        forward_batch = jax.jit(forward_batch_raw)

        def shared_synth_raw(cbatch):
            """Synthesis half of the shared-kinematics forward: GF values
            blended/shifted ONCE per receiver, each source a weight
            contraction -- the batched rendering of the reference's
            only_moment_changed shortcut (minimizer_engine.f90's dirty-flag
            DAG).  Returns (syn_rc [B, RC, nt], lo_rc [RC], hi_rc [RC])."""
            cent0 = {k: v[0] for k, v in cbatch.items()}
            mb = cbatch["m"]  # [B, C, 6]

            if rc_uniform:
                # fold the backazimuth rotation + component signs into the
                # weights: the synthesis is linear in the (a, r, d) channel
                # axis, so syn[b, k] = sum_o R[k, o] * ard[b, o] commutes
                # with the moment contraction.  The [R, B, 5, nt] canon of
                # the general path (~90 MB per 4096-row sweep) is never
                # materialized and the rc gather becomes a reshape.
                def per_rec(rec, chan_k, sign_k):
                    kin = synth._centroid_kinematics(cfg, rec, cent0)
                    v = synth.values_matrix(
                        ext, cfg, kin, group_size=group_size)
                    lo_, hi_ = synth.physical_spans(gfi, gfn, cfg, kin)
                    wv = jax.vmap(
                        lambda m6: synth.weights_from_angles(kin, m6, cfg.ng)
                    )(mb)  # [B, C, 3, ng]
                    wv = jnp.where(
                        kin["valid"][None, :, None, None], wv, 0.0)
                    cl = jnp.cos(rec["bazi"] + jnp.pi).astype(jnp.float32)
                    sl = jnp.sin(rec["bazi"] + jnp.pi).astype(jnp.float32)
                    one = jnp.float32(1.0)
                    zero = jnp.float32(0.0)
                    basis = jnp.stack([
                        jnp.stack([one, zero, zero]),    # away
                        jnp.stack([zero, one, zero]),    # right
                        jnp.stack([zero, zero, one]),    # down
                        jnp.stack([cl, -sl, zero]),      # north
                        jnp.stack([sl, cl, zero]),       # east
                    ])  # [5, 3] (synth.ard_to_components semantics)
                    rot = basis[chan_k] * sign_k[:, None]  # [K, 3]
                    wk = jnp.einsum("ko,bcog->bkcg", rot, wv,
                                    precision=synth.HIGHEST)
                    cc, gg = wk.shape[2], wk.shape[3]
                    # f32-exact contraction.  The MXU default routes f32
                    # through one bf16 pass (measured 2.7e-3 rel err --
                    # breaks the 1e-5 parity bar; invisible to the
                    # CPU-only oracle tests) and HIGHEST costs 6 passes on
                    # a K=C*ng-skinny matmul.  With few terms the unrolled
                    # broadcast-FMA chain fuses into ONE exact VPU kernel;
                    # large-C shared plans take the HIGHEST matmul.
                    if cc * gg <= 64:
                        w2 = wk.reshape(*wk.shape[:2], cc * gg)
                        v2 = v.reshape(cc * gg, -1)
                        syn_k = w2[:, :, 0, None] * v2[0][None, None, :]
                        for t in range(1, cc * gg):
                            syn_k = syn_k + (w2[:, :, t, None]
                                             * v2[t][None, None, :])
                    else:
                        bsz, k = wk.shape[0], wk.shape[1]
                        syn_k = jnp.matmul(
                            wk.reshape(bsz * k, -1),
                            v.reshape(cc * gg, -1),
                            precision=synth.HIGHEST,
                        ).reshape(bsz, k, -1)  # [B, K, nt_out]
                    return syn_k, lo_, hi_

                syn_all, los, his = jax.vmap(per_rec)(
                    recs, rc_chan_rk, rc_sign_rk)  # [R, B, K, nt], [R, 3]
                bsz = syn_all.shape[1]
                syn_rc = syn_all.transpose(1, 0, 2, 3).reshape(
                    bsz, nrec * rc_k, -1)  # [B, RC, nt]
                lo_rc = los[rc_rec_j, span_idx_j]  # [RC], batch-shared
                hi_rc = his[rc_rec_j, span_idx_j]
                return syn_rc, lo_rc, hi_rc

            def per_rec(rec):
                kin = synth._centroid_kinematics(cfg, rec, cent0)
                v = synth.values_matrix(ext, cfg, kin, group_size=group_size)
                lo_, hi_ = synth.physical_spans(gfi, gfn, cfg, kin)
                wv = jax.vmap(
                    lambda m6: synth.weights_from_angles(kin, m6, cfg.ng)
                )(mb)  # [B, C, 3, ng]
                wv = jnp.where(kin["valid"][None, :, None, None], wv, 0.0)
                # HIGHEST: see the uniform branch (bf16 single-pass default
                # measured 2.7e-3 rel err against the parity bar)
                ard_b = jnp.einsum("bcog,cgt->bot", wv, v,
                                   precision=synth.HIGHEST)  # [B, 3, nt_out]
                canon = jax.vmap(
                    lambda a: synth.ard_to_components(a, rec["bazi"], (1, 2, 3, 4, 5))
                )(ard_b)  # [B, 5, nt_out]
                return canon, lo_, hi_

            canon, los, his = jax.vmap(per_rec)(recs)  # [R, B, 5, nt], [R, 3]
            syn_rc = (
                canon[rc_rec_j, :, rc_chan_j] * rc_sign_j[:, None, None]
            ).transpose(1, 0, 2)  # [B, RC, nt]
            lo_rc = los[rc_rec_j, span_idx_j]  # [RC], batch-shared
            hi_rc = his[rc_rec_j, span_idx_j]
            return syn_rc, lo_rc, hi_rc

        def forward_shared_raw(cbatch, moments, risetimes):
            syn_rc, lo_rc, hi_rc = shared_synth_raw(cbatch)
            return eval_batch(syn_rc, lo_rc, hi_rc, moments, risetimes)

        # fused shared forward (round 5): the synthesis contraction rides
        # INSIDE the transposed scan kernel (ops/float_scan.fused_scan_sums),
        # so the [B, RC, nt] synthetic block never exists in HBM and the
        # scan's lane-tree reduce becomes a sublane reduce shared by 128
        # models.  Measured at bench shapes: 3.29 -> 1.65 ms per 4096-source
        # program (benchmark/micro_fused.py).  Requirements: floating norm
        # + no filters (use_fscan), uniform rec-major rc layout (the weight
        # rotation fold), batch-uniform risetimes (the STF fold then
        # commutes with the contraction -- callers gate on host), values
        # rows that fit VMEM alongside the ref stack, and few enough rows
        # for the kernel's unrolled contraction loop.
        from .ops.float_scan import fused_vmem_ok

        tprime = ncent * cfg.ng
        if eval_win is not None:
            _i0 = max(int(eval_win[0]) - st.ps0, 0)
            _i1 = min(int(eval_win[1]) - st.ps0 + 1, st.pl)
        else:
            _i0, _i1 = 0, st.pl
        _wk = min(-(-(_i1 - _i0) // 8) * 8, st.pl)
        # unlike use_fscan, the fused path covers FILTERED plans too (the
        # filter chain is linear and commutes with the contraction; exact
        # span masks replace the tail correction in-kernel)
        use_fused_scan = (
            method in (mf.FLOATING_L2NORM, mf.FLOATING_L1NORM)
            and os.environ.get("KIWI_FLOAT_SCAN", "1") != "0"
            and (_on_tpu() or os.environ.get("KIWI_FLOAT_SCAN_INTERPRET") == "1")
            and rc_uniform
            and tprime <= 64
            and fused_vmem_ok(s2 - s1 + 1, tprime, _wk, masked=any_filter)
            and os.environ.get("KIWI_FUSED_SCAN", "1") != "0"
        )

        def forward_shared_fused_raw(cbatch, moments, risetimes):
            """forward_shared_raw with synthesis fused into the scan kernel.
            Callers guarantee batch-uniform risetimes (risetimes[0] is used
            for the STF fold of the shared values rows)."""
            cent0 = {k: v[0] for k, v in cbatch.items()}
            mb = cbatch["m"]  # [B, C, 6]

            def per_rec(rec, chan_k, sign_k):
                kin = synth._centroid_kinematics(cfg, rec, cent0)
                v = synth.values_matrix(ext, cfg, kin, group_size=group_size)
                lo_, hi_ = synth.physical_spans(gfi, gfn, cfg, kin)
                wv = jax.vmap(
                    lambda m6: synth.weights_from_angles(kin, m6, cfg.ng)
                )(mb)  # [B, C, 3, ng]
                wv = jnp.where(kin["valid"][None, :, None, None], wv, 0.0)
                cl = jnp.cos(rec["bazi"] + jnp.pi).astype(jnp.float32)
                sl = jnp.sin(rec["bazi"] + jnp.pi).astype(jnp.float32)
                one = jnp.float32(1.0)
                zero = jnp.float32(0.0)
                basis = jnp.stack([
                    jnp.stack([one, zero, zero]),    # away
                    jnp.stack([zero, one, zero]),    # right
                    jnp.stack([zero, zero, one]),    # down
                    jnp.stack([cl, -sl, zero]),      # north
                    jnp.stack([sl, cl, zero]),       # east
                ])  # [5, 3] (synth.ard_to_components semantics)
                rot = basis[chan_k] * sign_k[:, None]  # [K, 3]
                # HIGHEST: tiny contraction, exactness over speed (the
                # bf16 single-pass default breaks the 1e-5 parity bar)
                wkw = jnp.einsum("ko,bcog->bkcg", rot, wv,
                                 precision=synth.HIGHEST)
                b_, k_, cc, gg = wkw.shape
                return (v.reshape(cc * gg, -1),
                        wkw.reshape(b_, k_, cc * gg), lo_, hi_)

            v_all, wk_all, los, his = jax.vmap(per_rec)(
                recs, rc_chan_rk, rc_sign_rk)
            # v_all [R, T, nt]; wk_all [R, B, K, T] -> wgt [RC, T, B]
            bsz = wk_all.shape[1]
            wgt_rtb = wk_all.transpose(0, 2, 3, 1).reshape(
                nrec * rc_k, tprime, bsz)
            lo_rc = los[rc_rec_j, span_idx_j]  # [RC], batch-shared
            hi_rc = his[rc_rec_j, span_idx_j]
            if any_taper or any_filter:
                v_rows = jnp.repeat(
                    v_all, rc_k, axis=0, total_repeat_length=nrec * rc_k)
                kshare = 1
            else:
                v_rows = v_all
                kshare = rc_k
            return mf.evaluate_misfits_floating_fused(
                ctx, v_rows, wgt_rtb, cfg.out_it0, lo_rc, hi_rc, method, st,
                nrec, moments, risetimes[0], fold_nshift_max=fold_max,
                rctx=rctx, shiftrange=shiftrange, any_taper=any_taper,
                any_filter=any_filter, eval_win=eval_win, k_share=kshare,
                interpret=not _on_tpu(),
            )

        def _scaled_traces(cent, moment, risetime):
            syn_rc, lo_rc, hi_rc = synth_rc(cent)
            if fold_max > 0:
                w = mf.fold_stf_weights(risetime, jnp.float32(st.dt), fold_max)
                syn_rc = mf.apply_fold(syn_rc, w)
                lo_rc = lo_rc - fold_max
                hi_rc = hi_rc + fold_max
            return syn_rc * moment, lo_rc, hi_rc

        synth_one = jax.jit(_scaled_traces)

        return {
            "cfg": cfg,
            "st": st,
            "ctx": ctx,
            "setup": setup,
            "per_source_bytes": per_source_bytes * nrec,
            "max_chunk": max_chunk,
            "fold_max": fold_max,
            "forward_batch": forward_batch,
            "forward_batch_raw": forward_batch_raw,
            "forward_batch_raw_xla": forward_batch_raw_xla,
            "forward_shared_raw": forward_shared_raw,
            "forward_shared_fused_raw": forward_shared_fused_raw,
            "use_fused_scan": use_fused_scan,
            "shared_synth_raw": shared_synth_raw,
            "eval_batch_raw": eval_batch,
            "use_fscan": use_fscan,
            "fused": {},  # (source_type, shape, edt) -> disc+forward jit
            "fused_shared": {},  # same, via the shared-kinematics forward
            "synth_one": synth_one,
            "layout": layout,
            "nrec": nrec,
        }

    def _discretize_batch(self, params_batch):
        model = get_source_model(self.source_type)
        pb = np.atleast_2d(np.asarray(params_batch, dtype=np.float32))
        if model.host_discretize:
            return self._discretize_batch_host(model, pb)
        shape = self._batch_shape(model, pb)
        cbatch = self._disc_fn(model, shape)(jnp.asarray(pb))
        moments, risetimes = self._post_factors(model, pb)
        # every jnp discretizer flattens [*cells, nt] row-major: runs of
        # shape[-1] consecutive centroids share their spatial position
        return cbatch, moments, risetimes, shape, int(shape[-1])

    def _batch_shape(self, model, pb):
        """The (single) discretization grid shape of a batch; shape-relevant
        param columns are deduplicated first so uniform sweeps cost one
        grid_shape call instead of one per row."""
        if model.shape_param_idx is not None:
            cols = pb[:, list(model.shape_param_idx)]
            if (cols == cols[0]).all():
                # uniform sweep (the hot case): np.unique(axis=0) costs
                # ~5 ms at B=4096, the equality check microseconds
                rows = cols[:1]
            else:
                rows = np.unique(cols, axis=0)
            full = np.tile(pb[0], (rows.shape[0], 1))
            full[:, list(model.shape_param_idx)] = rows
        else:
            full = pb
        shapes = {model.grid_shape(p, self.effective_dt) for p in full}
        if len(shapes) != 1:
            raise ValueError(
                f"source batch has mixed grid shapes {shapes}; bucket the batch "
                "by shape (gridsearch does this automatically)"
            )
        return shapes.pop()

    def _post_factors(self, model, pb):
        if model.post_factors_batch is not None:
            m, r = model.post_factors_batch(pb)
            return np.asarray(m, np.float32), np.asarray(r, np.float32)
        pf = np.array([model.post_factors(p) for p in pb], dtype=np.float32)
        return pf[:, 0], pf[:, 1]

    def _disc_fn(self, model, shape):
        key = (self.source_type, shape, self.effective_dt)
        disc = self._disc_cache.get(key)
        if disc is None:
            edt = self.effective_dt
            disc = jax.jit(jax.vmap(lambda p: model.discretize(p, edt, shape)))
            self._disc_cache[key] = disc
        return disc

    def _discretize_batch_host(self, model, pb):
        """Host-side discretization (eikonal models): pad the per-source
        centroid tables to a common length with active=False.

        With eikonal_device=True and a real batch, the eikonal solve +
        downsampling run batched on device (fast sweeping) instead of
        serial host FMM."""
        ctx = self.eikonal_context()
        from .sources import eikonal as eiksrc

        if (
            self.eikonal_device
            and len(pb) >= 2
            and model.name in eiksrc.NAMED_PARAMS
        ):
            named = eiksrc.named_params_batch(model.name, pb)
            static, arrays = eiksrc.prepare_batch(named, self.effective_dt, ctx)
            # rigorous host bound on per-cell time-cell count: cell duration
            # is 4x the mean |t - mean t| over the cell (psm_downsample_grid
            # semantics), bounded by 4 * celldiag / minspeed (eikonal
            # solutions are 1-Lipschitz in the d/speed metric; the solver's
            # dead-zone floor is 0.5 * minspeed)
            diag = np.hypot(arrays["cdelta"][:, 0], arrays["cdelta"][:, 1])
            ntmax_hard = int(
                np.floor(4.0 * diag / np.maximum(arrays["minspeed"], 1.0)
                         / self.effective_dt).max()) + 2

            self._check_eik_overflow()
            ckey = (model.name, static["NF"], static["NC"],
                    float(self.effective_dt), ctx.content_key())
            calib = self._eik_calib.get(ckey)
            hosts = {}
            if calib is None:
                # calibrate the static table budgets from the host oracle
                # on the batch's most demanding members: the hard bound
                # pads ~4x in time cells (typical crossing spans are a
                # fraction of the worst case) and ~1.6x in cells (disc vs
                # bounding box), and the synthesis kernel pays for every
                # padded row.  The async overflow counter catches later
                # batches that outgrow the calibration.
                radius = np.asarray(
                    named[0]["bord_radius"] if isinstance(named, tuple)
                    else [p["bord_radius"] for p, _m, _r in named])
                members = {0, len(pb) - 1, int(np.argmax(radius))}
                for i in sorted(members):
                    hosts[i] = model.discretize(pb[i], self.effective_dt, ctx)
                ncell = int(static["NC"][0]) * int(static["NC"][1])
                st = [h["stats"] for h in hosts.values()]
                # ntmax = the probed members' measured need, NO +1 margin:
                # the synthesis kernel pays for every padded table row
                # (bench rupture: max_nt == 1 for every cell, so the margin
                # alone doubled C), and a member that does outgrow the
                # calibration is exactly what the async overflow counter
                # catches -- one batch ships with clipped time cells (a
                # warned, discretization-level approximation) and the
                # budget widens to the rigorous bound
                ntmax = min(max(s["max_nt"] for s in st), ntmax_hard)
                budget = -(-int(np.ceil(
                    max(s["n_cells"] for s in st) * 1.2)) // 8) * 8
                calib = (max(ntmax, 1), budget if budget < ncell else None,
                         ntmax_hard)
                self._eik_calib[ckey] = calib
            ntmax, budget, _hard = calib
            cbatch = dict(eiksrc.discretize_device_batch(
                static, arrays, self.effective_dt, ctx, ntmax,
                ncell_budget=budget,
            ))
            self._eik_pending.append((ckey, cbatch.pop("overflow")))
            # validate K >= 3 randomly chosen batch members (not just
            # source 0) once per (model, table shape, dt): a discretizer
            # regression affecting only members != 0 (e.g. a batch-indexing
            # bug) must not pass silently
            key = (model.name, int(cbatch["north"].shape[1]),
                   float(self.effective_dt))
            if key not in self._eikonal_checked_keys:
                self._eikonal_checked_keys.add(key)
                rng = np.random.default_rng(len(self._eikonal_checked_keys))
                k = min(3, len(pb))
                idxs = set(hosts) | {0} | set(
                    int(i) for i in rng.choice(len(pb), size=k, replace=False)
                )
                bad = [i for i in sorted(idxs)
                       if not self._eikonal_crosscheck_ok(
                           model, pb[i], cbatch, ctx, member=i,
                           host=hosts.get(i))]
                if bad:
                    import logging

                    logging.getLogger(__name__).warning(
                        "device eikonal discretization disagrees with the "
                        "host FMM oracle beyond tolerance for batch "
                        "member(s) %s; falling back to the host pipeline "
                        "(engine.eikonal_device = False)", bad
                    )
                    self.eikonal_device = False
                    return self._discretize_batch_host(model, pb)
            moments, risetimes = self._post_factors(model, pb)
            c = int(cbatch["north"].shape[1])
            # device tables are [ncell, ntmax] row-major -> groups of ntmax
            return cbatch, moments, risetimes, (c,), int(ntmax)

        tables = [model.discretize(p, self.effective_dt, ctx) for p in pb]
        cmax = max(t["north"].shape[0] for t in tables)
        cmax = -(-cmax // 16) * 16
        out = {}
        for k in ("north", "east", "depth", "time"):
            arr = np.zeros((len(tables), cmax), dtype=np.float32)
            for i, t in enumerate(tables):
                arr[i, : t[k].shape[0]] = t[k]
            out[k] = jnp.asarray(arr)
        marr = np.zeros((len(tables), cmax, 6), dtype=np.float32)
        aarr = np.zeros((len(tables), cmax), dtype=bool)
        for i, t in enumerate(tables):
            n = t["m"].shape[0]
            marr[i, :n] = t["m"]
            aarr[i, :n] = t["active"]
        out["m"] = jnp.asarray(marr)
        out["active"] = jnp.asarray(aarr)
        moments, risetimes = self._post_factors(model, pb)
        # host FMM tables have ragged per-cell time runs: no uniform groups
        return out, moments, risetimes, (cmax,), 1

    def _check_eik_overflow(self, force=False):
        """Deferred (sync-free) guard on the calibrated device-eikonal
        table budgets.  On overflow the calibration for that shape is
        widened to the rigorous hard bound (one synthesis-plan recompile);
        the overflowed batch itself shipped with clipped time cells /
        dropped cells -- a discretization-level approximation on a few
        cells, flagged here.

        Counters are drained only once their device buffer is READY:
        fetching an unresolved counter would block the host behind the
        previous batch's whole discretize program -- measured as THE
        pipeline rate limiter of the eikonal regime (the host spent the
        full device batch time inside this fetch).  Unresolved counters
        queue (bounded: the oldest is force-fetched past 8 pending)."""
        if not self._eik_pending:
            return
        still = []
        for i, (ckey, ov) in enumerate(self._eik_pending):
            must = force or len(self._eik_pending) - i > 8
            if not must and hasattr(ov, "is_ready") and not ov.is_ready():
                still.append((ckey, ov))
                continue
            self._drain_eik_overflow(ckey, ov)
        self._eik_pending = still

    def _drain_eik_overflow(self, ckey, ov):
        ov = int(np.asarray(ov).max(initial=0))
        if ov > 0:
            import logging

            calib = self._eik_calib.get(ckey)
            hard = calib[2] if calib else ov
            self._eik_calib[ckey] = (hard, None, hard)
            logging.getLogger(__name__).warning(
                "device eikonal table calibration overflowed by %d "
                "rows/cells on the previous batch (its misfits carry a "
                "small extra discretization error); widening the table "
                "budget to the rigorous bound for %s", ov, ckey,
            )

    def _eikonal_crosscheck_ok(self, model, p0, cbatch, ctx, rtol=2e-3,
                               member=0, host=None):
        """First-use validation of the device fast-sweeping discretizer
        against the host FMM oracle: the moment-weighted summary statistics
        of batch member `member`'s centroid table must agree (the full
        tables can't be compared cell-by-cell -- the pipelines discretize
        time differently -- but their misfit-relevant moments must match;
        the misfit-level tolerance is pinned in tests/test_invert.py::
        test_eikonal_device_batch_matches_host)."""

        def stats(north, east, depth, time, m, active):
            w = np.abs(np.asarray(m, np.float64)).sum(axis=-1) * np.asarray(active)
            tot = w.sum()
            if tot <= 0:
                return np.zeros(5)
            c = np.array([
                (w * np.asarray(north, np.float64)).sum() / tot,
                (w * np.asarray(east, np.float64)).sum() / tot,
                (w * np.asarray(depth, np.float64)).sum() / tot,
                (w * np.asarray(time, np.float64)).sum() / tot,
                tot,
            ])
            return c

        if host is None:
            host = model.discretize(p0, self.effective_dt, ctx)
        s_host = stats(host["north"], host["east"], host["depth"], host["time"],
                       host["m"], host["active"])
        i = member
        s_dev = stats(
            np.asarray(cbatch["north"])[i], np.asarray(cbatch["east"])[i],
            np.asarray(cbatch["depth"])[i], np.asarray(cbatch["time"])[i],
            np.asarray(cbatch["m"])[i], np.asarray(cbatch["active"])[i],
        )
        scale = np.array([
            max(abs(s_host[0]), 100.0), max(abs(s_host[1]), 100.0),
            max(abs(s_host[2]), 100.0), max(abs(s_host[3]), self.effective_dt),
            max(abs(s_host[4]), 1e-30),
        ])
        return bool(np.all(np.abs(s_dev - s_host) <= rtol * scale))

    def _ensure_plan(self, cbatch, risetime_max, shape, stats=None, gsize=1):
        if stats is not None:
            extent, depth_range, time_range = stats
        else:
            extent, depth_range, time_range = self._centroid_stats(cbatch)
        st = self.store
        xstep = 4.0 * st.dx
        zstep = 4.0 * st.dz
        tstep = 8.0 * st.dt
        extent_b = self._bucket(extent * 1.1 + 0.01, xstep)
        dr = (
            np.floor(depth_range[0] / zstep) * zstep,
            self._bucket(depth_range[1] + 0.01, zstep),
        )
        tr = (
            np.floor(time_range[0] / tstep) * tstep,
            self._bucket(time_range[1] + st.dt, tstep),
        )
        rt = self._bucket(risetime_max, 4.0 * st.dt) if risetime_max > 0 else 0.0
        key = (extent_b, dr, tr, rt, np.prod(shape), gsize)
        if self._plan is None or self._plan_key != key:
            self._plan = self._make_plan(extent_b, dr, tr, rt, shape, gsize=gsize)
            self._plan_key = key
        return self._plan

    # -- queries --------------------------------------------------------------

    def misfits_for_source_batch(self, params_batch):
        """(misfits [B, RC], norms [B, RC], floating_shifts [B, R])."""
        if not self._refs:
            raise RuntimeError("no reference seismograms set")
        model = get_source_model(self.source_type)
        pb = np.atleast_2d(np.asarray(params_batch, dtype=np.float32))
        stats = self._param_stats(model, pb)
        if not model.host_discretize and stats is not None:
            # fused path: discretization + forward under ONE jit (one device
            # dispatch per chunk instead of two)
            shape = self._batch_shape(model, pb)
            moments, risetimes = self._post_factors(model, pb)
            gsize = int(shape[-1])
            plan = self._ensure_plan(
                None, float(risetimes.max(initial=0.0)), shape,
                stats=stats, gsize=gsize,
            )
            shared = (
                pb.shape[0] >= 2
                and model.shared_kin_check is not None
                and model.shared_kin_check(pb)
            )
            # fused-scan variant: synthesis contraction inside the scan
            # kernel.  Needs batch-uniform risetimes (host-checked here;
            # the STF fold then commutes with the contraction).
            fuse = bool(
                shared and plan.get("use_fused_scan")
                and risetimes.size and (risetimes == risetimes[0]).all()
            )
            fkey = (self.source_type, shape, self.effective_dt, fuse)
            cache = plan["fused_shared"] if shared else plan["fused"]
            fwd = cache.get(fkey)
            if fwd is None:
                disc = self._disc_fn(model, shape)
                if not shared and plan.get("max_chunk"):
                    # window-kernel plans: keep discretizer and forward as
                    # separate jits -- inlining the XLA discretizer into
                    # the pallas-call graph measured 20.3 ms vs 11.1 + 2.1
                    # composed (both dispatches are async; no extra host
                    # round trip)
                    fb = plan["forward_batch"]
                    fwd = lambda pbj, mts, rts: fb(disc(pbj), mts, rts)  # noqa: E731
                elif (shared and plan.get("use_fscan")
                      and os.environ.get("KIWI_FSCAN_SPLIT", "0") == "1"):
                    # ablation knob: shared-kinematics forward as two jits
                    # (XLA disc+synthesis | pallas scan eval) instead of one
                    # fused program, mirroring the window-path split above
                    sy = jax.jit(lambda pbj: plan["shared_synth_raw"](disc(pbj)))
                    ev = jax.jit(plan["eval_batch_raw"])

                    def fwd(pbj, mts, rts):
                        syn_rc, lo_rc, hi_rc = sy(pbj)
                        return ev(syn_rc, lo_rc, hi_rc, mts, rts)
                else:
                    if fuse:
                        raw = plan["forward_shared_fused_raw"]
                    else:
                        raw = plan[
                            "forward_shared_raw" if shared else "forward_batch_raw"]
                    fwd = jax.jit(lambda pbj, mts, rts: raw(disc(pbj), mts, rts))
                cache[fkey] = fwd

            def run(idx):
                return fwd(jnp.asarray(pb[idx]), jnp.asarray(moments[idx]),
                           jnp.asarray(risetimes[idx]))
        else:
            cbatch, moments, risetimes, shape, gsize = self._discretize_batch(pb)
            plan = self._ensure_plan(
                cbatch, float(risetimes.max(initial=0.0)), shape,
                stats=stats, gsize=gsize,
            )
            # chunk slicing INSIDE the jit: eager per-chunk gathers of the
            # device cbatch dispatched ~6 tiny device programs per chunk
            # (~3 ms of host issue each through the tunnel) -- measured as
            # ~75 ms/batch of host-bound issue on the eikonal regime, the
            # largest single contributor to its pipeline floor
            fwd_idx = plan.get("forward_batch_idx")
            if fwd_idx is None:
                fb_raw = plan["forward_batch_raw"]
                fwd_idx = jax.jit(
                    lambda cb, idx, mts, rts: fb_raw(
                        {k: v[idx] for k, v in cb.items()}, mts, rts))
                plan["forward_batch_idx"] = fwd_idx

            def run(idx):
                if idx.shape[0] == moments.shape[0] and (
                        idx == np.arange(idx.shape[0])).all():
                    return plan["forward_batch"](
                        cbatch, jnp.asarray(moments), jnp.asarray(risetimes))
                return fwd_idx(
                    cbatch, jnp.asarray(idx), jnp.asarray(moments[idx]),
                    jnp.asarray(risetimes[idx])
                )

        b = moments.shape[0]
        # keep per-call transients bounded (device HBM budget); XLA fuses
        # much of it, but the scatter/gather buffers can materialize
        chunk = int(max(8, min(b, self.memory_budget // max(plan["per_source_bytes"], 1))))
        if plan.get("max_chunk"):
            chunk = max(1, min(chunk, plan["max_chunk"]))
        if chunk >= b:
            return run(np.arange(b))
        # balance chunk sizes (256 over a 78 cap would otherwise run
        # 78+78+78+22->pad78, wasting 22% of the last dispatch)
        chunk = -(-b // (-(-b // chunk)))
        ms, ns, fss = [], [], []
        for i in range(0, b, chunk):
            sl = slice(i, min(i + chunk, b))
            # pad the tail chunk to the compiled shape
            idx = np.arange(sl.start, sl.stop)
            if idx.shape[0] < chunk:
                idx = np.concatenate([idx, np.full(chunk - idx.shape[0], b - 1)])
            m, n, fs = run(idx)
            keep = sl.stop - sl.start
            ms.append(m[:keep])
            ns.append(n[:keep])
            fss.append(fs[:keep])
        return jnp.concatenate(ms), jnp.concatenate(ns), jnp.concatenate(fss)

    _gm_batch = staticmethod(jax.jit(jax.vmap(mf.global_misfit)))

    def global_misfits_for_source_batch(self, params_batch):
        m, n, _ = self.misfits_for_source_batch(params_batch)
        # one jitted dispatch (the eager vmap issued ~8 tiny device ops)
        return self._gm_batch(m, n)

    def sweep_global_misfits(self, base_params, col, values):
        """Global misfits g[N] for a one-column sweep around base_params.

        The batch never exists on the host: one jitted program tiles the
        base row, sets column `col` to `values`, discretizes, synthesizes,
        evaluates, and reduces each row to its global misfit
        (minimizer_engine.f90:935-942) -- the host ships N floats and
        receives N floats per dispatch.  This is the grid-search inner
        loop with the per-dispatch host half (batch tiling, param stats,
        [N, nparams] transfers, a second reduction dispatch) removed;
        misfits_for_source_batch on the same sweep spends more wall time
        issuing than the device spends computing (docs/performance.md).

        Falls back to misfits_for_source_batch + global_misfit when the
        fused design does not apply: host-discretize models, sweeps that
        change the discretization grid shape, window-kernel plans whose
        chunk cap is below N, or models without batched post factors.
        """
        if not self._refs:
            raise RuntimeError("no reference seismograms set")
        model = get_source_model(self.source_type)
        base = np.asarray(base_params, np.float32).reshape(-1)
        values = np.asarray(values, np.float32).reshape(-1)
        col = int(col)
        n = values.shape[0]
        vmin, vmax = float(values.min()), float(values.max())
        # repeat-sweep memo: grid searches dispatch the same (base, col)
        # spec with fresh values every call; the host prep below (probe
        # rows, stats, plan key) costs ~2 ms -- comparable to the whole
        # device program -- so skip it when a previous dispatch already
        # planned a covering value range
        # effective_dt is in the key because set_effective_dt (alone among
        # the setters) does not invalidate the plan -- `hit[0] is
        # self._plan` would otherwise still pass and replay the old dt's
        # discretization
        mkey = (self.source_type, col, n, self.effective_dt, base.tobytes())
        memo = self._sweep_memo
        hit = memo.get(mkey)
        if hit is not None and hit[0] is self._plan and (
                hit[1] <= vmin and vmax <= hit[2]):
            # hit[4] is the device-resident base row: the memo key pins its
            # bytes, so the host->device put (~0.45 ms of tunnel RPC per
            # call, half the warm issue cost) happens once per (base, col)
            return hit[3](hit[4], jnp.asarray(values))
        # 3-row probe: host-side shape/stat/sharedness decisions cover the
        # sweep's full range without materializing the batch
        pb3 = np.tile(base, (3, 1))
        pb3[:, col] = (vmin, vmax, float(base[col]))

        def fallback():
            pb = np.tile(base, (n, 1))
            pb[:, col] = values
            try:
                m, nn, _ = self.misfits_for_source_batch(pb)
            except ValueError:
                # sweep crosses discretization-grid shapes: bucket rows by
                # shape (what gridsearch does for general parameter grids)
                groups = {}
                for i in range(n):
                    s = model.grid_shape(pb[i], self.effective_dt)
                    groups.setdefault(s, []).append(i)
                res = jnp.zeros(n, jnp.float32)
                for idx in groups.values():
                    m, nn, _ = self.misfits_for_source_batch(pb[idx])
                    g = jax.vmap(mf.global_misfit)(m, nn)
                    res = res.at[jnp.asarray(np.asarray(idx))].set(
                        g.astype(jnp.float32))
                return res
            return jax.vmap(mf.global_misfit)(m, nn)

        if model.host_discretize or model.post_factors_batch is None:
            return fallback()
        try:
            shape = self._batch_shape(model, pb3)
        except ValueError:
            return fallback()
        stats = self._param_stats(model, pb3)
        if stats is None:
            return fallback()
        _m3, r3 = self._post_factors(model, pb3)
        plan = self._ensure_plan(None, float(r3.max(initial=0.0)), shape,
                                 stats=stats, gsize=int(shape[-1]))
        shared = (model.shared_kin_check is not None
                  and model.shared_kin_check(pb3))
        if not shared and plan.get("max_chunk") and plan["max_chunk"] < n:
            return fallback()
        # HBM-budget guard: the fused sweep runs all n rows in ONE device
        # program, skipping the memory_budget chunking the batch path
        # applies.  Non-shared XLA plans materialize per-source transients
        # (per_source_bytes models them); shared plans are far lighter
        # (weights + [B, RC, nt] traces), so only a generous row cap
        # applies there.
        if not shared and plan["per_source_bytes"] * n > self.memory_budget:
            return fallback()
        if shared and n > 65536:
            return fallback()
        # fused-scan variant: the 3-row probe's risetimes bound the sweep's
        # (post factors depend on the swept column alone), so equal probe
        # risetimes == batch-uniform risetimes
        fuse = bool(shared and plan.get("use_fused_scan")
                    and (r3 == r3[0]).all())
        key = (self.source_type, shape, self.effective_dt, col, n, shared, fuse)
        sweeps = plan.setdefault("sweep", {})
        fn = sweeps.get(key)
        if fn is None:
            edt = self.effective_dt
            if fuse:
                raw = plan["forward_shared_fused_raw"]
            else:
                raw = plan["forward_shared_raw" if shared else "forward_batch_raw"]

            def sweep_fn(basej, vals):
                pb = jnp.tile(basej[None, :], (n, 1))
                pb = pb.at[:, col].set(vals)
                cb = jax.vmap(lambda p: model.discretize(p, edt, shape))(pb)
                moments, risetimes = model.post_factors_batch(pb)
                m, nrm, _fs = raw(
                    cb, jnp.asarray(moments, jnp.float32),
                    jnp.asarray(risetimes, jnp.float32))
                return jax.vmap(mf.global_misfit)(m, nrm)

            fn = jax.jit(sweep_fn)
            sweeps[key] = fn
        basej = jnp.asarray(base)
        self._sweep_memo[mkey] = (self._plan, vmin, vmax, fn, basej)
        return fn(basej, jnp.asarray(values))

    def global_misfits_and_grad(self, params_batch, mesh=None):
        """Batched global misfits g[B] AND dg/dparams [B, nparams] by
        reverse-mode autodiff through the forward model.

        mesh: optional jax.sharding.Mesh with a source axis "s"
        (parallel.make_mesh): the batch axis is sharded over it and the
        value+gradient program runs SPMD -- multi-chip multi-start
        descent needs no collectives (each start's misfit is
        independent; GF window and misfit context replicate).

        No reference counterpart: minimizer_engine.f90:729-874's LM builds
        forward-difference Jacobians (n+1 forwards per step).  Here the
        discretize -> synthesize -> misfit chain is a pure array program,
        so one backward pass yields the gradient w.r.t. EVERY parameter
        for ~2 forwards of work, independent of the parameter count.
        The gradient is exact a.e.: fractional 2-tap time shifts and
        bilinear GF interpolation are piecewise linear in the source
        parameters (integer grid snaps are the kinks, measure-zero).

        Differentiates the XLA formulation (the Pallas window/scan
        kernels define no VJP and are bypassed); device-discretize
        models only -- host/FMM eikonal pipelines break the trace.
        """
        if not self._refs:
            raise RuntimeError("no reference seismograms set")
        model = get_source_model(self.source_type)
        if model.host_discretize or model.post_factors_batch is None:
            raise NotImplementedError(
                f"autodiff gradients need a device discretizer and "
                f"vectorized post factors (source type {self.source_type!r})"
            )
        pb = np.atleast_2d(np.asarray(params_batch, dtype=np.float32))
        stats = self._param_stats(model, pb)
        if stats is None:
            raise NotImplementedError(
                f"source type {self.source_type!r} provides no host-side "
                "param_stats bounds"
            )
        shape = self._batch_shape(model, pb)
        _, risetimes = self._post_factors(model, pb)
        plan = self._ensure_plan(
            None, float(risetimes.max(initial=0.0)), shape,
            stats=stats, gsize=int(shape[-1]),
        )
        gkey = (self.source_type, shape, self.effective_dt)
        cache = plan.setdefault("grad_fns", {})
        vg = cache.get(gkey)
        if vg is None:
            edt = self.effective_dt
            disc_raw = jax.vmap(lambda p: model.discretize(p, edt, shape))
            fwd = plan["forward_batch_raw_xla"]
            pfb = model.post_factors_batch

            def stable_l2(x):
                # sqrt(sum x^2) via enorm-style max scaling (sminpack's
                # enorm does the same for the same reason): misfit scales
                # follow the moment convention -- protocol sessions use
                # moment 1.0, where squared sums sit ~1e-38 and TPUs
                # flush the denormals to zero.  Double-wheres keep the
                # backward pass finite at the all-zero point (a perfect
                # reference match) with the 0 subgradient.
                a = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1)
                a_s = jnp.where(a == 0.0, 1.0, a)
                y = x.astype(jnp.float32) / a_s[..., None]
                return a * mf.gsqrt(jnp.sum(y * y, axis=-1))

            def scalar(pbj):
                cb = disc_raw(pbj)
                mts, rts = pfb(pbj)
                m, n, _fs = fwd(
                    cb, jnp.asarray(mts, jnp.float32),
                    jnp.asarray(rts, jnp.float32),
                )
                sm = stable_l2(m)
                sn = stable_l2(n)
                g = sm / jnp.where(sn == 0.0, 1.0, sn)
                return jnp.sum(g), g

            vg = jax.jit(jax.value_and_grad(scalar, has_aux=True))
            cache[gkey] = vg

        ns = 1
        put = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ns = int(mesh.shape.get("s", 1))
            sh = NamedSharding(mesh, P("s", None))
            put = lambda rows: jax.device_put(rows, sh)  # noqa: E731

        b = pb.shape[0]
        # the backward pass roughly triples the forward's live transients;
        # chunks stay multiples of the source-shard count
        chunk = int(max(8, min(b, ns * self.memory_budget
                               // max(3 * plan["per_source_bytes"], 1))))
        if plan.get("max_chunk"):
            chunk = max(1, min(chunk, ns * plan["max_chunk"]))
        chunk = max(ns, chunk // ns * ns)
        if chunk < b:
            # balance: split ceil(b/ns) shard-groups evenly over the chunks
            nchunks = -(-b // chunk)
            ngroups = -(-b // ns)
            chunk = -(-ngroups // nchunks) * ns
        gs, grads = [], []
        for i in range(0, b, chunk):
            idx = np.arange(i, min(i + chunk, b))
            keep = idx.shape[0]
            if keep < chunk:
                idx = np.concatenate([idx, np.full(chunk - keep, b - 1)])
            (_tot, g), grad = vg(put(pb[idx]))
            gs.append(np.asarray(g[:keep]))
            grads.append(np.asarray(grad[:keep]))
        return np.concatenate(gs), np.concatenate(grads)

    def get_misfits(self):
        """Per-(receiver, component) (misfit, norm) for the current source."""
        m, n, fs = self.misfits_for_source_batch(self.source_params[None, :])
        m = np.asarray(m[0])
        if np.isnan(m).any():  # minimizer_engine.f90:1163-1166
            logging.getLogger("kiwi_tpu").warning(
                "NaN misfit(s) for rc rows %s", np.flatnonzero(np.isnan(m)))
        return m, np.asarray(n[0]), np.asarray(fs[0])

    def get_global_misfit(self):
        m, n, _ = self.misfits_for_source_batch(self.source_params[None, :])
        return float(mf.global_misfit(m[0], n[0]))

    def get_synthetic_seismograms(self):
        """[(values f32[n], itmin)] per rc row, scaled (moment + rise time),
        trimmed to the physical data span -- probe_get_plain equivalents."""
        plan = self._current_plan()
        cbatch, moments, risetimes, shape, _gsize = self._discretize_batch(
            self.source_params[None, :]
        )
        cent = {k: v[0] for k, v in cbatch.items()}
        syn, lo, hi = plan["synth_one"](
            cent, jnp.float32(moments[0]), jnp.float32(risetimes[0])
        )
        syn = np.asarray(syn)
        if not np.isfinite(syn).all():  # seismogram.f90:290-295's NaN/huge check
            logging.getLogger("kiwi_tpu").warning(
                "non-finite synthetic seismogram samples "
                "(source outside the GF database's validity range?)")
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        out = []
        it0 = plan["cfg"].out_it0
        nt = plan["cfg"].nt_out
        for irc in range(syn.shape[0]):
            a = max(int(lo[irc]) - it0, 0)
            b = min(int(hi[irc]) - it0, nt - 1)
            out.append((syn[irc, a : b + 1].copy(), it0 + a))
        return out

    def set_synthetic_reference(self):
        """Synthesize the current source and install it as the reference
        (seismosizer.py:523-527's self-consistency hook)."""
        traces = self.get_synthetic_seismograms()
        for irc, (values, itmin) in enumerate(traces):
            span = dataspan(values, itmin)
            if span is None:
                values = np.zeros(1, np.float32)
            else:
                values = values[span[0] - itmin : span[1] - itmin + 1]
                itmin = span[0]
            self._refs[irc] = (np.asarray(values, np.float32), int(itmin))
        self._invalidate()

    def get_distances(self):
        geom = self._geometry()
        return np.asarray(geom.dist), np.asarray(geom.azi)

    def get_floating_shifts(self):
        _m, _n, fs = self.misfits_for_source_batch(self.source_params[None, :])
        return np.asarray(fs[0]) * self.store.dt

    # -- parameter masks / subparameters (minimizer_engine.f90:525-610) -------

    def set_source_params_mask(self, mask):
        model = get_source_model(self.source_type)
        mask = np.asarray(mask, dtype=bool)
        if mask.shape != (model.nparams,):
            raise ValueError("wrong number of elements in mask")
        self.params_mask = mask
        self.subparam_mins = None
        self.subparam_maxs = None

    def set_source_subparams(self, subparams, normalized=False):
        if self.source_params is None:
            raise RuntimeError("source parameters must be set prior to subparams")
        mask = getattr(self, "params_mask", None)
        if mask is None:
            raise RuntimeError("no source params mask set")
        sub = np.asarray(subparams, dtype=np.float32)
        if sub.shape[0] != int(mask.sum()):
            raise ValueError("wrong number of subparams")
        model = get_source_model(self.source_type)
        p = self.source_params.copy()
        p[mask] = sub * model.norm[mask] if normalized else sub
        self.set_source_params(self.source_type, p)

    def get_source_subparams(self, normalized=False):
        mask = getattr(self, "params_mask", None)
        if mask is None:
            raise RuntimeError("no source params mask set")
        model = get_source_model(self.source_type)
        sub = self.source_params[mask]
        return sub / model.norm[mask] if normalized else sub

    def set_source_subparams_limits(self, mins, maxs):
        mask = getattr(self, "params_mask", None)
        n = int(mask.sum()) if mask is not None else 0
        mins = np.asarray(mins, np.float64)
        maxs = np.asarray(maxs, np.float64)
        if mins.shape[0] != n or maxs.shape[0] != n:
            raise ValueError("wrong number of subparam limits")
        self.subparam_mins = mins
        self.subparam_maxs = maxs

    def minimize_lm(self):
        """(info, iterations, misfit) -- minimizer_engine.f90:729-805."""
        from .invert import minimize_lm as _lm

        mask = getattr(self, "params_mask", None)
        return _lm(
            self,
            mask=mask,
            subparam_mins=getattr(self, "subparam_mins", None),
            subparam_maxs=getattr(self, "subparam_maxs", None),
        )

    def misfit_jacobian(self, params, mask=None):
        """(m [RC], J [RC, n_free]): misfit rows and their exact Jacobian
        w.r.t. the masked subparams at `params`, by forward-mode autodiff
        (one jvp pass per free parameter through the XLA forward).

        These are the same rows minimize_lm's lmdif minimizes (sum m^2),
        so J feeds the standard linearized-least-squares covariance
        (invert.gradient.covariance) -- the reference stack has no
        counterpart (tunguska bootstraps instead).  Device-discretize
        models only, like global_misfits_and_grad."""
        if not self._refs:
            raise RuntimeError("no reference seismograms set")
        model = get_source_model(self.source_type)
        if model.host_discretize or model.post_factors_batch is None:
            raise NotImplementedError(
                f"autodiff Jacobians need a device discretizer "
                f"(source type {self.source_type!r})"
            )
        p = np.asarray(params, dtype=np.float32).reshape(-1)
        if mask is None:
            mask = np.ones(model.nparams, dtype=bool)
        idx = np.flatnonzero(np.asarray(mask, dtype=bool))
        pb = p[None, :]
        stats = self._param_stats(model, pb)
        if stats is None:
            raise NotImplementedError(
                f"source type {self.source_type!r} provides no host-side "
                "param_stats bounds")
        shape = self._batch_shape(model, pb)
        _, risetimes = self._post_factors(model, pb)
        plan = self._ensure_plan(
            None, float(risetimes.max(initial=0.0)), shape,
            stats=stats, gsize=int(shape[-1]),
        )
        jkey = (self.source_type, shape, self.effective_dt, tuple(idx))
        cache = plan.setdefault("jac_fns", {})
        jf = cache.get(jkey)
        if jf is None:
            edt = self.effective_dt
            disc_raw = jax.vmap(lambda q: model.discretize(q, edt, shape))
            fwd = plan["forward_batch_raw_xla"]
            pfb = model.post_factors_batch
            idx_j = jnp.asarray(idx)

            def rows(sub, base):
                q = base.at[idx_j].set(sub)[None, :]
                cb = disc_raw(q)
                mts, rts = pfb(q)
                m, _n, _fs = fwd(
                    cb, jnp.asarray(mts, jnp.float32),
                    jnp.asarray(rts, jnp.float32),
                )
                return m[0]

            def jf_raw(sub, base):
                # one linearization: primal + all n jvps (jacfwd would
                # re-run the primal internally, paying n+2 forwards)
                m, lin = jax.linearize(lambda s: rows(s, base), sub)
                basis = jnp.eye(sub.shape[0], dtype=sub.dtype)
                return m, jax.vmap(lin)(basis).T  # [RC, n_free]

            jf = jax.jit(jf_raw)
            cache[jkey] = jf
        m, J = jf(jnp.asarray(p[idx]), jnp.asarray(p))
        return np.asarray(m), np.asarray(J)

    def minimize_gradient(self, steps=150, lr=0.03, nstarts=1):
        """(misfit, steps, starts) -- the autodiff sibling of minimize_lm
        (no reference counterpart); honors the same mask/limit setters."""
        from .invert import minimize_gradient as _mg

        return _mg(
            self,
            mask=getattr(self, "params_mask", None),
            subparam_mins=getattr(self, "subparam_mins", None),
            subparam_maxs=getattr(self, "subparam_maxs", None),
            steps=steps, lr=lr, nstarts=nstarts,
        )

    def get_principal_axes(self):
        """(pax, tax) as (azimuth, colatitude) degrees for sdr-type sources
        (minimizer_engine.f90:1248-1258)."""
        from .euler import pt_axes, rotmats_from_sdr
        from .sources.base import DEG2RAD_F32

        model = get_source_model(self.source_type)
        names = model.names
        if "strike" not in names or "dip" not in names or "slip-rake" not in names:
            return np.zeros(2), np.zeros(2)
        p = self.source_params
        strike = float(p[names.index("strike")]) * float(DEG2RAD_F32)
        dip = float(p[names.index("dip")]) * float(DEG2RAD_F32)
        rake = float(p[names.index("slip-rake")]) * float(DEG2RAD_F32)
        _rr, rs = rotmats_from_sdr(strike, dip, rake, 0.0)
        return pt_axes(rs)

    # -- probe-processed trace access (probe_get_*, comparator.f90:356-433) ---

    def _probe_rows(self, which):
        """All probe arrays [RC, PL] (plain extension applied) + dataspans."""
        plan = self._current_plan()
        st = plan["st"]
        setup = plan["setup"]
        if which == "synthetics":
            cbatch, moments, risetimes, shape, _gsize = self._discretize_batch(
                self.source_params[None, :]
            )
            cent = {k: v[0] for k, v in cbatch.items()}
            syn, lo, hi = plan["synth_one"](
                cent, jnp.float32(moments[0]), jnp.float32(risetimes[0])
            )
            arr = np.asarray(mf.place_on_probe(syn, plan["cfg"].out_it0, st))
            return st, setup, arr, np.asarray(lo), np.asarray(hi)
        arr = setup.ref.copy()
        return st, setup, arr, setup.ref_lo.copy(), setup.ref_hi.copy()

    def _param_stats(self, model, pb):
        """Host-side conservative centroid bounds from raw params (None if
        the model has no param_stats -- the engine then falls back to
        _centroid_stats, which syncs discretized arrays off the device)."""
        if model.param_stats is None:
            return None
        if model.param_stats_ctx:
            return model.param_stats(pb, self.effective_dt,
                                     self.eikonal_context())
        return model.param_stats(pb, self.effective_dt)

    def _current_plan(self):
        model = get_source_model(self.source_type)
        pb = self.source_params[None, :]
        stats = self._param_stats(model, pb)
        cbatch, moments, risetimes, shape, gsize = self._discretize_batch(pb)
        return self._ensure_plan(
            cbatch, float(risetimes.max(initial=0.0)), shape, stats=stats, gsize=gsize
        )

    def get_processed_seismograms(self, which="synthetics", processing="plain"):
        """[(values, itmin)] rows for output_seismograms: plain/tapered/
        filtered processing like probe_get (comparator.f90:421-433)."""
        if which == "synthetics" and processing == "plain":
            return self.get_synthetic_seismograms()
        plan = self._current_plan()
        st = plan["st"]
        setup = plan["setup"]
        st_, setup_, arr, lo, hi = self._probe_rows(which)
        ctx = plan["ctx"]
        tap, filt, _amp, _ampf = mf.processed_arrays(ctx, jnp.asarray(arr), st)
        tap = np.asarray(tap)
        filt = np.asarray(filt)
        out = []
        for irc in range(setup.nrc):
            if processing == "plain":
                row, a, b = arr[irc], lo[irc], hi[irc]
            elif processing == "tapered":
                if setup.has_taper[irc]:
                    # span = taper span ^ data span, falling back to the data
                    # span when empty (probe_get_tapered, comparator.f90:380-391)
                    row = tap[irc]
                    a = max(setup.taper_lo[irc], int(lo[irc]))
                    b = min(setup.taper_hi[irc], int(hi[irc]))
                    if a > b:
                        a, b = int(lo[irc]), int(hi[irc])
                else:
                    row, a, b = arr[irc], lo[irc], hi[irc]
            elif processing == "filtered":
                if setup.has_filter[irc]:
                    row = filt[irc]
                    a = setup.taper_lo[irc] if setup.has_taper[irc] else lo[irc]
                    b = setup.taper_hi[irc] if setup.has_taper[irc] else hi[irc]
                else:
                    row, a, b = (tap[irc], setup.taper_lo[irc], setup.taper_hi[irc]) \
                        if setup.has_taper[irc] else (arr[irc], lo[irc], hi[irc])
            else:
                raise ValueError(f"unknown processing {processing!r}")
            a = int(np.clip(a, st.ps0, st.ps0 + st.pl - 1))
            b = int(np.clip(b, a, st.ps0 + st.pl - 1))
            out.append((row[a - st.ps0 : b - st.ps0 + 1].copy(), a))
        return out

    def get_amp_spectra(self, which="synthetics", processing="filtered"):
        """[(amplitudes, df)] rows (probe_get_amp_spectrum,
        comparator.f90:333-354)."""
        plan = self._current_plan()
        st = plan["st"]
        ctx = plan["ctx"]
        setup = plan["setup"]
        st_, setup_, arr, _lo, _hi = self._probe_rows(which)
        _tap, _filt, amp, ampf = mf.processed_arrays(ctx, jnp.asarray(arr), st)
        amp = np.asarray(amp)
        ampf = np.asarray(ampf)
        out = []
        for irc in range(setup.nrc):
            a = ampf[irc] if (processing == "filtered" and setup.has_filter[irc]) else amp[irc]
            out.append((a.copy(), st.df))
        return out

    def get_cross_correlations(self, shiftrange_s):
        """[S, RC] windowed cross correlations + the shift sample indices
        (output_cross_correlations, minimizer_engine.f90:1283-1307)."""
        from .gf.trace import fnint

        plan = self._current_plan()
        st = plan["st"]
        ctx = plan["ctx"]
        s1 = int(fnint(np.float32(shiftrange_s[0]) / np.float32(self.store.dt)))
        s2 = int(fnint(np.float32(shiftrange_s[1]) / np.float32(self.store.dt)))
        _st, setup, arr, lo, hi = self._probe_rows("synthetics")
        cc = mf.cross_correlation(ctx, jnp.asarray(arr), (s1, s2), st)
        return np.asarray(cc), np.arange(s1, s2 + 1)

    def autoshift_ref_seismograms(self, shiftrange_s, ireceiver=None):
        """Shift refs to the xcorr-power maximum (receiver_autoshift_...,
        receiver.f90:816-832).  Returns shift seconds per receiver."""
        cc, shifts = self.get_cross_correlations(shiftrange_s)
        layout = self._rc_layout()
        out = []
        for irec in range(len(self.receivers)):
            rows = [i for i, (r, _c) in enumerate(layout) if r == irec]
            sub = cc[:, rows]  # [S, ncomp]
            denom = max(1.0, float(sub.max()))
            power = (np.maximum(sub / denom, 0.0) ** 2).sum(axis=1)
            imax = int(np.argmax(power))
            ishift = int(shifts[imax])
            if ireceiver is None or ireceiver == irec:
                self.shift_ref_seismogram(irec, ishift)
                out.append(ishift * self.store.dt)
        return np.array(out)

    def shift_ref_seismogram(self, irec, ishift):
        for irc, (r, _c) in enumerate(self._rc_layout()):
            if r == irec and irc in self._refs:
                values, itmin = self._refs[irc]
                self._refs[irc] = (values, itmin + int(ishift))
        self._invalidate()

    def get_peak_amplitudes(self, differentiate):
        """Per-receiver max |d^k u/dt^k| vector norms over grouped components
        (get_peak_amplitudes, minimizer_engine.f90:1174-1212)."""
        return self._vec_diagnostic(differentiate=differentiate)

    def get_arias_intensities(self):
        """(minimizer_engine.f90:1214-1246)."""
        return self._vec_diagnostic(arias=True)

    def _vec_diagnostic(self, differentiate=None, arias=False):
        plan = self._current_plan()
        st = plan["st"]
        setup = plan["setup"]
        ctx = plan["ctx"]
        _st, _setup, arr, lo, hi = self._probe_rows("synthetics")
        tap, filt, _a, _af = mf.processed_arrays(ctx, jnp.asarray(arr), st)
        tap = np.asarray(tap)
        filt = np.asarray(filt)
        layout = self._rc_layout()
        out = []
        for irec, rec in enumerate(self.receivers):
            if not rec.enabled:
                continue
            # component grouping (get_component_ids, receiver.f90:512-542)
            rows = {c: i for i, (r, c) in enumerate(layout) if r == irec}
            ver = next((rows[c] for c in "du" if c in rows), None)
            h1 = next((rows[c] for c in "ac" if c in rows), None)
            h2 = next((rows[c] for c in "rl" if c in rows), None)
            if h1 is None or h2 is None:
                h1 = next((rows[c] for c in "ns" if c in rows), None)
                h2 = next((rows[c] for c in "ew" if c in rows), None)
            if h1 is None or h2 is None:
                h1 = h2 = None
            used = [i for i in (ver, h1, h2) if i is not None]
            if not used:
                out.append(0.0)
                continue
            dt = st.dt
            vals = []
            for i in used:
                if setup.has_filter[i]:
                    row = filt[i]
                elif setup.has_taper[i]:
                    row = tap[i]
                else:
                    row = arr[i]
                if setup.has_taper[i]:
                    a = setup.taper_lo[i] - st.ps0
                    b = setup.taper_hi[i] - st.ps0
                else:
                    a = int(lo[i]) - st.ps0
                    b = int(hi[i]) - st.ps0
                vals.append(row[a : b + 1].astype(np.float64))
            n = min(v.shape[0] for v in vals)
            vals = [v[:n] for v in vals]
            if arias:
                d2 = [v[:-2] - 2 * v[1:-1] + v[2:] for v in vals]
                total = sum((d * d for d in d2), np.zeros(n - 2)).sum()
                out.append(float(np.pi / (2 * 9.81) * dt * total / dt**2))
            elif differentiate == 1:
                d1 = [v[:-1] - v[1:] for v in vals]
                power = sum((d * d for d in d1), np.zeros(n - 1))
                out.append(float(np.sqrt(power.max()) / dt))
            else:
                d2 = [v[:-2] - 2 * v[1:-1] + v[2:] for v in vals]
                power = sum((d * d for d in d2), np.zeros(n - 2))
                out.append(float(np.sqrt(power.max()) / dt**2))
        return np.array(out)
