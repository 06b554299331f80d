"""GF-store distance sharding: model parallelism for giant databases.

The reference scales past one machine's memory by assigning each minimizer
process a *distance-contiguous subset of the receivers*, so every process
only ever reads the GF database chunks covering its receivers' distances
(seismosizer.py:89-124's distance-balanced receiver split).  The TPU-native
equivalent: shard the receiver axis over a mesh axis and give each device
only the GF *window* covering its receivers -- the store's distance axis is
physically partitioned across chips, synthesis and misfits run SPMD under
`shard_map`, and only the tiny per-row misfit outputs leave the shard.

Per-device memory = window(dist span of its receivers) instead of
window(dist span of all receivers): for a teleseismic set spread over
thousands of km this is the difference between "does not fit" and "fits".

All shards share one static `SynthConfig` (same nxw/nt windows, padded to
the widest group); only the window *origin* differs and rides along as a
dynamic per-shard `window_ix0` (threaded through `synth.gf_indices`).
Outputs are bitwise-comparable to the unsharded engine (same kernels, same
window extension semantics) up to f32 reduction order.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import misfit as mf
from .. import synth
from ..gf.trace import fnint
from ..sources import get_source_model


def partition_receivers(geom, n):
    """Distance-contiguous, count-balanced receiver groups (the reference's
    distance heuristic, seismosizer.py:107-124).  Returns a list of n index
    arrays (some possibly empty when n > nreceivers)."""
    order = np.argsort(geom.dist, kind="stable")
    return [np.sort(chunk) for chunk in np.array_split(order, n)]


def _edge_extend_host(data, itmin, e0, nt_ext):
    """numpy materialize_window (zero-left / repeat-right extension)."""
    nt = data.shape[-1]
    idx = e0 + np.arange(nt_ext)
    rel = idx[None, None, None, :] - itmin[..., None]
    out = np.take_along_axis(
        data, np.clip(rel, 0, nt - 1).astype(np.int64), axis=-1
    )
    return np.where(rel < 0, np.float32(0.0), out).astype(np.float32)


@dataclasses.dataclass
class GFShardedPlan:
    """Compiled distance-sharded forward.  Build with `build_plan`.

    Forwards are built lazily per (ncent, group_size, shared) batch shape
    by `fwd_builder` and cached, so each shard runs the SAME fast
    formulation the unsharded engine would pick for that batch
    (synth.choose_formulation): grouped span-table synthesis, the window
    Pallas kernel when eligible, and the shared-kinematics contraction for
    moment-only batches -- the reference's design point that every worker
    runs its fastest loop on its shard (seismosizer.py:89-124).
    """

    engine: object
    mesh: object
    axis: str
    source_axis: object
    cfg: object
    st: object
    groups: list  # receiver index arrays per shard
    rc_of: list  # global rc row indices per shard (unpadded)
    rc_max: int
    r_max: int
    fwd_builder: object  # (ncent, gsize, shared) -> jitted shard_map forward
    sharded_args: tuple  # (ext, gfi, gfn, ix0, tab, recs, ctx, rctx, aux)
    built_stats: tuple = None  # (extent, depth_range, time_range) the windows cover
    origins: list = None  # per-shard distance-window origins (store ix)
    _fwds: dict = dataclasses.field(default_factory=dict)
    last_formulation: object = None  # synth.Formulation of the last batch

    def _batch_exceeds_built_stats(self, pb):
        """Cheap tier: conservative param_stats of the batch vs the stats the
        windows were built from.  False = provably covered, no device sync."""
        if self.built_stats is None:
            return False
        model = get_source_model(self.engine.source_type)
        ext, (d0, d1), (t0, t1) = self.engine._param_stats(model, pb)
        bext, (bd0, bd1), (bt0, bt1) = self.built_stats
        eps = 1e-3
        return (ext > bext + eps or d0 < bd0 - eps or d1 > bd1 + eps
                or t0 < bt0 - eps or t1 > bt1 + eps)

    def _check_coverage_precise(self, cbatch):
        """Exact tier: the per-shard GF windows were sized from the source the
        plan was built for; a centroid outside a shard's window clips to
        valid=False and silently synthesizes zeros (the unsharded engine
        re-plans from batch stats instead).  Mirror gf_indices' validity math
        on the ACTUAL discretized centroids and raise with a rebuild hint."""
        cfg = self.cfg
        eng = self.engine
        act = np.asarray(cbatch.get("active", np.bool_(True)))
        act = np.broadcast_to(act, np.asarray(cbatch["north"]).shape).astype(bool)
        if not act.any():
            return
        off = float(np.hypot(np.asarray(cbatch["north"]), np.asarray(cbatch["east"]))[act].max())
        cd = np.asarray(cbatch["depth"])[act]
        ct = np.asarray(cbatch["time"])[act]
        xu = cfg.xunder if cfg.interpolate else 1
        zu = cfg.zunder if cfg.interpolate else 1
        geom = eng._geometry()
        problems = []
        for s, (idx, o) in enumerate(zip(self.groups, self.origins or [])):
            if len(idx) == 0:
                continue
            dlo = float(geom.dist[idx].min()) - off
            dhi = float(geom.dist[idx].max()) + off
            ix1 = int(np.floor((dlo - cfg.firstx) / (cfg.dx * xu))) * xu
            ix2 = int(np.floor((dhi - cfg.firstx) / (cfg.dx * xu))) * xu + xu
            if ix1 < o or ix2 > o + cfg.nxw - 1:
                problems.append(
                    f"shard {s}: distances [{dlo:.0f}, {dhi:.0f}] m need store "
                    f"ix [{ix1}, {ix2}] outside window [{o}, {o + cfg.nxw - 1}]"
                )
        zlo = float(cd.min()) - float(geom.depth.max())
        zhi = float(cd.max()) - float(geom.depth.min())
        iz1 = int(np.floor((zlo - cfg.firstz) / (cfg.dz * zu))) * zu
        iz2 = int(np.floor((zhi - cfg.firstz) / (cfg.dz * zu))) * zu + zu
        if iz1 < cfg.iz0 or iz2 > cfg.iz0 + cfg.nzw - 1:
            problems.append(
                f"depths [{zlo:.0f}, {zhi:.0f}] m need store iz [{iz1}, {iz2}] "
                f"outside window [{cfg.iz0}, {cfg.iz0 + cfg.nzw - 1}]"
            )
        s1 = int(np.floor(float(ct.min()) / cfg.dt))
        s2 = int(np.floor(float(ct.max()) / cfg.dt)) + 1
        if s1 < cfg.s_base or s2 > cfg.s_base + cfg.s_len - 1:
            problems.append(
                f"centroid times [{ct.min():.2f}, {ct.max():.2f}] s need shifts "
                f"[{s1}, {s2}] outside [{cfg.s_base}, {cfg.s_base + cfg.s_len - 1}]"
            )
        if problems:
            raise ValueError(
                "source batch exceeds the GF window coverage this sharded plan "
                "was built for:\n  " + "\n  ".join(problems) + "\nset the widest "
                "search-space source on the engine and rebuild with "
                "gfshard.build_plan"
            )

    def misfits(self, params_batch):
        """(misfit [B, RC], norm [B, RC], shift [B, R]) in the engine's
        global rc/receiver order, computed SPMD across the mesh."""
        import jax

        from .. import synth as _synth
        from ..sources import get_source_model as _gsm

        eng = self.engine
        pb = np.atleast_2d(np.asarray(params_batch, dtype=np.float32))
        b = pb.shape[0]
        ns = int(self.mesh.shape[self.source_axis]) if self.source_axis else 1
        if b % ns:  # pad the batch to the source-shard count
            pb = np.concatenate([pb, np.tile(pb[-1:], (ns - b % ns, 1))])
        cbatch, moments, risetimes, _shape, gsize = eng._discretize_batch(pb)
        if self._batch_exceeds_built_stats(pb):
            self._check_coverage_precise(cbatch)
        model = _gsm(eng.source_type)
        shared = (
            pb.shape[0] >= 2
            and model.shared_kin_check is not None
            and model.shared_kin_check(pb)
        )
        ncent = int(cbatch["north"].shape[1])
        form = _synth.choose_formulation(self.cfg, ncent, gsize, self.r_max)
        self.last_formulation = form
        key = (ncent, form.group_size, bool(shared), bool(form.use_window))
        fwd = self._fwds.get(key)
        if fwd is None:
            fwd = self.fwd_builder(form, shared)
            self._fwds[key] = fwd

        def run(cb, mts, rts):
            return fwd(*self.sharded_args, cb, jnp.asarray(mts),
                       jnp.asarray(rts))

        bp = pb.shape[0]  # padded batch size
        # the window kernel's SMEM cap applies per device: chunk the global
        # batch in multiples of the source-shard count
        cap = bp if form.max_chunk is None else min(
            bp, max(ns, form.max_chunk * ns))
        if cap < bp:
            nchunks = -(-bp // cap)
            cap = -(-(bp // ns) // nchunks) * ns  # balance
            outs = []
            for i in range(0, bp, cap):
                idx = np.arange(i, min(i + cap, bp))
                if idx.shape[0] < cap:
                    idx = np.concatenate(
                        [idx, np.full(cap - idx.shape[0], bp - 1)])
                cb = {k: v[jnp.asarray(idx)] for k, v in cbatch.items()}
                out = run(cb, moments[idx], risetimes[idx])
                keep = min(i + cap, bp) - i
                outs.append([np.asarray(o)[:keep] for o in out])
            m, n, fs = (np.concatenate(parts) for parts in zip(*outs))
        else:
            m, n, fs = run(cbatch, moments, risetimes)
        m = np.asarray(m)[:b]  # [B, n_shards * rc_max]
        n = np.asarray(n)[:b]
        fs = np.asarray(fs)[:b]  # [B, n_shards * r_max]
        nrc = sum(len(rc) for rc in self.rc_of)
        nrec = len(eng.receivers)
        mg = np.zeros((b, nrc), np.float32)
        ng = np.zeros((b, nrc), np.float32)
        sg = np.zeros((b, nrec), np.int32)
        for s, (idx, rcrows) in enumerate(zip(self.groups, self.rc_of)):
            mg[:, rcrows] = m[:, s * self.rc_max : s * self.rc_max + len(rcrows)]
            ng[:, rcrows] = n[:, s * self.rc_max : s * self.rc_max + len(rcrows)]
            sg[:, idx] = fs[:, s * self.r_max : s * self.r_max + len(idx)]
        return mg, ng, sg

    def global_misfits(self, params_batch):
        m, n, _ = self.misfits(params_batch)
        return np.sqrt((m.astype(np.float64) ** 2).sum(axis=1)) / np.sqrt(
            (n.astype(np.float64) ** 2).sum(axis=1)
        )

    def shard_window_bytes(self):
        """Per-device GF window bytes (the memory the sharding saves)."""
        ext = self.sharded_args[0]
        return int(np.prod(ext.shape[1:])) * 4


def build_plan(engine, mesh, axis="r", source_axis="auto"):
    """Build a distance-sharded forward for the engine's current source
    search space.  Each of the mesh's `axis` devices receives only the GF
    window covering its receiver group (padded to a common width).

    source_axis: mesh axis to shard the source batch over ("auto" picks
    "s" when the mesh has one, None replicates) -- with both axes the
    forward is fully 2-D parallel: sources x (receivers + their GF store
    partition), the TPU rendering of SURVEY's process-pool strategy."""
    if source_axis == "auto":
        source_axis = "s" if "s" in mesh.axis_names and mesh.shape.get("s", 1) > 1 else None
    eng = engine
    eng._require_ready()
    store = eng.store
    n = int(mesh.shape[axis])
    geom = eng._geometry()
    groups = partition_receivers(geom, n)

    model = get_source_model(eng.source_type)
    stats = eng._param_stats(model, eng.source_params[None, :])
    extent, depth_range, time_range = stats

    # global config fixes everything but the window origin
    cfg0 = synth.plan_config(
        store, geom, extent, depth_range, time_range,
        interpolate=eng.interpolate, xunder=eng.xunder, zunder=eng.zunder,
    )

    # per-group distance windows, padded to a common width
    widths, origins = [], []
    for idx in groups:
        if len(idx) == 0:
            widths.append(2)
            origins.append(0)
            continue
        g = synth.plan_config(
            store, _SubGeom(geom, idx), extent, depth_range, time_range,
            interpolate=eng.interpolate, xunder=eng.xunder, zunder=eng.zunder,
        )
        widths.append(g.nxw)
        origins.append(g.ix0)
    nxw = max(widths)
    if nxw > store.nx:
        nxw = store.nx
    origins = [min(max(o, 0), store.nx - nxw) for o in origins]
    cfg = dataclasses.replace(cfg0, ix0=0, nxw=nxw)

    # per-shard GF windows (host numpy -> device, sharded over `axis`)
    e0 = cfg.out_it0 - cfg.s_base - cfg.s_len
    nt_ext = cfg.nt_out + cfg.s_len
    zsl = np.s_[cfg.iz0 : cfg.iz0 + cfg.nzw]
    exts, gfis, gfns = [], [], []
    for o in origins:
        xsl = np.s_[o : o + nxw]
        exts.append(_edge_extend_host(store.data[xsl, zsl], store.itmin[xsl, zsl], e0, nt_ext))
        gfis.append(store.itmin[xsl, zsl])
        gfns.append(store.nsamples[xsl, zsl])
    shard = NamedSharding(mesh, P(axis))
    ext = jax.device_put(np.stack(exts), shard)
    gfi = jax.device_put(np.stack(gfis).astype(np.int32), shard)
    gfn = jax.device_put(np.stack(gfns).astype(np.int32), shard)
    ix0 = jax.device_put(np.asarray(origins, np.int32), shard)

    # per-shard receiver geometry + misfit contexts, padded
    layout = eng._rc_layout()
    rc_of = [
        np.array([i for i, (r, _c) in enumerate(layout) if r in set(idx)], np.int64)
        for idx in groups
    ]
    r_max = max(max((len(i) for i in groups), default=1), 1)
    rc_max = max(max((len(r) for r in rc_of), default=1), 1)

    gd = geom.device()
    recs_np = {k: np.asarray(v) for k, v in gd.items()}
    rec_stacks = {k: [] for k in recs_np}
    ctx_stacks = None
    rctx_stacks = None
    s1 = int(fnint(np.float32(eng.floating_shiftrange_s[0]) / np.float32(store.dt)))
    s2 = int(fnint(np.float32(eng.floating_shiftrange_s[1]) / np.float32(store.dt)))

    # global probe span (identical to the unsharded plan's)
    fold_max = 0
    risetime_max = 0.0
    pf = model.post_factors(np.asarray(eng.source_params))
    risetime_max = float(pf[1])
    if risetime_max > 0:
        fold_max = int(np.ceil(0.5 * risetime_max / store.dt)) + 1
    lo = cfg.out_it0 - fold_max
    hi = cfg.out_it0 + cfg.nt_out - 1 + fold_max
    maxreflen = 1
    for irc, (values, itmin) in eng._refs.items():
        lo = min(lo, itmin + s1)
        hi = max(hi, itmin + len(values) - 1 + s2)
        maxreflen = max(maxreflen, len(values))
    minlength = 2 * max(cfg.nt_out, maxreflen)
    ps0, ps1 = mf.allowed_span((lo, hi), minlength)
    st = mf.ProbeStatic(ps0=ps0, pl=ps1 - ps0 + 1, dt=store.dt)

    method = eng.misfit_method
    any_taper = any(True for _ in eng._tapers)
    any_filter = any(True for _ in eng._filters)
    per_rec = getattr(eng, "_per_rec_shiftrange", {})

    rc_chan_stack, rc_sign_stack, rc_recl_stack, span_idx_stack = [], [], [], []
    span_of_chan = np.array([0, 1, 2, 0, 0], dtype=np.int32)
    for sidx, (idx, rcrows) in enumerate(zip(groups, rc_of)):
        # receiver arrays, padded by repeating the last real entry
        for k, v in recs_np.items():
            rows = v[idx] if len(idx) else v[:1]
            padded = np.concatenate(
                [rows, np.repeat(rows[-1:], r_max - len(rows), axis=0)]
            )
            rec_stacks[k].append(padded)

        # local misfit setup: one slot per local receiver + one padding slot
        local_of_global = {int(g): i for i, g in enumerate(idx)}
        rec_ids = np.full(rc_max, r_max, np.int32)  # padding slot
        chan = np.zeros(rc_max, np.int32)
        sign = np.ones(rc_max, np.float32)
        for j, rcrow in enumerate(rcrows):
            r, c = layout[rcrow]
            rec_ids[j] = local_of_global[r]
            cid = synth.COMPONENT_IDS[c]
            chan[j] = abs(cid) - 1
            sign[j] = np.sign(cid)
        setup = mf.MisfitSetup(st, rec_ids)
        setup.enabled[:] = False
        for j, rcrow in enumerate(rcrows):
            r, _c = layout[rcrow]
            setup.enabled[j] = eng.receivers[r].enabled
            if rcrow in eng._refs:
                setup.set_ref(j, *eng._refs[rcrow])
            if rcrow in eng._tapers:
                setup.set_taper(j, eng._tapers[rcrow])
            if rcrow in eng._filters:
                setup.set_filter(j, eng._filters[rcrow])
            tmin, tmax = per_rec.get(r, eng.floating_shiftrange_s)
            setup.shift_lo[j] = int(fnint(np.float32(tmin) / np.float32(store.dt)))
            setup.shift_hi[j] = int(fnint(np.float32(tmax) / np.float32(store.dt)))
        setup.syn_factor[:] = eng.synthetics_factor
        ctx = setup.device()
        rctx = mf.precompute_ref_context(ctx, method, st, (s1, s2), any_taper, any_filter)
        if ctx_stacks is None:
            ctx_stacks = {k: [] for k in ctx}
            rctx_stacks = {k: [] for k in rctx}
        for k in ctx:
            ctx_stacks[k].append(np.asarray(ctx[k]))
        for k in rctx:
            rctx_stacks[k].append(
                np.asarray(rctx[k]) if hasattr(rctx[k], "shape") else rctx[k]
            )
        rc_chan_stack.append(chan)
        rc_sign_stack.append(sign)
        rc_recl_stack.append(rec_ids)
        span_idx_stack.append(span_of_chan[chan])

    recs = {k: jax.device_put(np.stack(v), shard) for k, v in rec_stacks.items()}
    ctxd = {k: jax.device_put(np.stack(v), shard) for k, v in ctx_stacks.items()}
    rctxd = {}
    rctx_static = {}  # method/base strings: identical per shard, closed over
    for k, v in rctx_stacks.items():
        if hasattr(v[0], "shape"):
            rctxd[k] = jax.device_put(np.stack(v), shard)
        else:
            rctx_static[k] = v[0]
    aux = jax.device_put(
        {
            "chan": np.stack(rc_chan_stack),
            "sign": np.stack(rc_sign_stack),
            "span_idx": np.stack(span_idx_stack),
        },
        shard,
    )

    shiftrange = (s1, s2)
    nrec_local = r_max + 1  # + padding slot

    # per-shard span-union tables (synth.span_tables): one [4]-row gather
    # per centroid instead of [C, 2, 2, ng] element gathers -- the same
    # 10x saving the unsharded engine took in round 2
    tabs = [
        np.asarray(jax.jit(synth.span_tables, static_argnums=2)(
            jnp.asarray(t_gfi.astype(np.int32)), jnp.asarray(t_gfn.astype(np.int32)), cfg))
        for t_gfi, t_gfn in zip(gfis, gfns)
    ]
    tab = jax.device_put(np.stack(tabs), shard)

    sa = source_axis
    from ..ops import synth_window

    def fwd_builder(form, shared):
        """jitted shard_map forward for one (Formulation, shared?) combo.

        Each shard runs the identical fast formulation the unsharded
        engine picks (synth.choose_formulation): grouped span-table
        synthesis, the window Pallas kernel when eligible, or the
        shared-kinematics weight contraction for moment-only batches."""
        gw = max(form.group_size, 1)
        interp = not synth.on_tpu()

        def locals_of(ext_s, gfi_s, gfn_s, ix0_s, tab_s, recs_s, ctx_s,
                      rctx_s, aux_s):
            recs_l = {k: v[0] for k, v in recs_s.items()}
            recs_l["window_ix0"] = jnp.full((r_max,), ix0_s[0], jnp.int32)
            ctx_l = {k: v[0] for k, v in ctx_s.items()}
            rctx_l = {k: v[0] for k, v in rctx_s.items()} | rctx_static
            aux_l = {k: v[0] for k, v in aux_s.items()}
            return (ext_s[0], gfi_s[0], gfn_s[0], tab_s[0], recs_l, ctx_l,
                    rctx_l, aux_l)

        def rc_gather(ctx_l, aux_l, canon, los, his):
            rl = ctx_l["receiver_ids"]
            rl_c = jnp.clip(rl, 0, r_max - 1)  # padding rows read any row
            syn_rc = canon[rl_c, aux_l["chan"]] * aux_l["sign"][:, None]
            lo_rc = los[rl_c, aux_l["span_idx"]]
            hi_rc = his[rl_c, aux_l["span_idx"]]
            return syn_rc, lo_rc, hi_rc

        def eval_rows(ctx_l, rctx_l, syn_rc, lo_rc, hi_rc, moment, risetime):
            return mf.evaluate_misfits(
                ctx_l, syn_rc, cfg.out_it0, lo_rc, hi_rc, method, st,
                nrec_local, moment=moment, risetime=risetime,
                fold_nshift_max=fold_max, shiftrange=shiftrange, rctx=rctx_l,
                any_taper=any_taper, any_filter=any_filter,
            )

        # batched floating-shift scan kernel, like the unsharded engine's
        # eval_batch (engine._make_plan): one pass over each synthetic
        # instead of S HBM re-reads, per shard
        import os as _os

        use_fscan = (
            method in (mf.FLOATING_L2NORM, mf.FLOATING_L1NORM)
            and not any_filter
            and _os.environ.get("KIWI_FLOAT_SCAN", "1") != "0"
            and (synth.on_tpu()
                 or _os.environ.get("KIWI_FLOAT_SCAN_INTERPRET") == "1")
        )

        def eval_rows_batch(ctx_l, rctx_l, syn_rc_b, lo_b, hi_b, moments,
                            risetimes):
            if use_fscan:
                return mf.evaluate_misfits_floating_batch(
                    ctx_l, syn_rc_b, cfg.out_it0, lo_b, hi_b, method, st,
                    nrec_local, moments, risetimes,
                    fold_nshift_max=fold_max, rctx=rctx_l,
                    shiftrange=shiftrange, any_taper=any_taper,
                    eval_win=None, interpret=interp,
                )
            lo_b = jnp.broadcast_to(jnp.atleast_2d(lo_b), syn_rc_b.shape[:2])
            hi_b = jnp.broadcast_to(jnp.atleast_2d(hi_b), syn_rc_b.shape[:2])
            return jax.vmap(
                lambda syn, l1, h1, mo, rt: eval_rows(
                    ctx_l, rctx_l, syn, l1, h1, mo, rt)
            )(syn_rc_b, lo_b, hi_b, moments, risetimes)

        def shard_fn(ext_s, gfi_s, gfn_s, ix0_s, tab_s, recs_s, ctx_s,
                     rctx_s, aux_s, cbatch, moments, risetimes):
            (ext_l, gfi_l, gfn_l, tab_l, recs_l, ctx_l, rctx_l,
             aux_l) = locals_of(ext_s, gfi_s, gfn_s, ix0_s, tab_s, recs_s,
                                ctx_s, rctx_s, aux_s)

            if shared:
                # moment-only batch: GF values blended/shifted ONCE per
                # receiver; each source is a weight contraction (the
                # batched only_moment_changed shortcut, like the engine's
                # forward_shared_raw)
                cent0 = {k: v[0] for k, v in cbatch.items()}
                mb = cbatch["m"]  # [B_local, C, 6]

                def per_rec(rec):
                    kin = synth._centroid_kinematics(cfg, rec, cent0)
                    v = synth.values_matrix(ext_l, cfg, kin, group_size=gw)
                    lo_, hi_ = synth.physical_spans_from_tables(tab_l, cfg, kin)
                    wv = jax.vmap(
                        lambda m6: synth.weights_from_angles(kin, m6, cfg.ng)
                    )(mb)  # [B, C, 3, ng]
                    wv = jnp.where(kin["valid"][None, :, None, None], wv, 0.0)
                    # HIGHEST: the unpinned default routes f32 through one
                    # bf16 MXU pass on TPU -- measured 2.7e-3 rel err
                    # against the 1e-5 parity bar (engine.py shared path)
                    ard_b = jnp.einsum("bcog,cgt->bot", wv, v,
                                       precision=synth.HIGHEST)
                    canon = jax.vmap(
                        lambda a: synth.ard_to_components(
                            a, rec["bazi"], (1, 2, 3, 4, 5))
                    )(ard_b)  # [B, 5, nt_out]
                    return canon, lo_, hi_

                canon, los, his = jax.vmap(per_rec)(recs_l)  # [R, B, 5, nt]
                rl = ctx_l["receiver_ids"]
                rl_c = jnp.clip(rl, 0, r_max - 1)
                syn_rc = (
                    canon[rl_c, :, aux_l["chan"]] * aux_l["sign"][:, None, None]
                ).transpose(1, 0, 2)  # [B, RC, nt]
                lo_rc = los[rl_c, aux_l["span_idx"]]  # [RC], batch-shared
                hi_rc = his[rl_c, aux_l["span_idx"]]

                m, nn, fs = eval_rows_batch(ctx_l, rctx_l, syn_rc, lo_rc,
                                            hi_rc, moments, risetimes)
            elif form.use_window:
                ext_flat = synth_window.pack_ext(ext_l, cfg)

                def kin_one(cent):
                    return jax.vmap(
                        lambda rec: synth._centroid_kinematics(cfg, rec, cent)
                    )(recs_l)

                kin = jax.vmap(kin_one)(cbatch)  # leaves [B, R, C, ...]
                ard = synth_window.synthesize_ard_batch(
                    ext_flat, cfg, kin, gw, interpret=interp)
                lo, hi = jax.vmap(jax.vmap(
                    lambda k: synth.physical_spans_from_tables(tab_l, cfg, k)
                ))(kin)  # [B, R, 3]
                canon = jax.vmap(
                    lambda ab: jax.vmap(
                        lambda a, bz: synth.ard_to_components(
                            a, bz, (1, 2, 3, 4, 5))
                    )(ab, recs_l["bazi"])
                )(ard)  # [B, R, 5, nt_out]

                syn_rc, lo_rc, hi_rc = jax.vmap(
                    lambda cn, lo1, hi1: rc_gather(ctx_l, aux_l, cn, lo1, hi1)
                )(canon, lo, hi)
                m, nn, fs = eval_rows_batch(ctx_l, rctx_l, syn_rc, lo_rc,
                                            hi_rc, moments, risetimes)
            else:
                def forward_one(cent, moment, risetime):
                    def per_rec(rec):
                        ard, lo_, hi_ = synth.synthesize_with_spans(
                            ext_l, gfi_l, gfn_l, cfg, rec, cent,
                            path=form.path, group_size=form.group_size,
                            span_tab=tab_l,
                        )
                        canon = synth.ard_to_components(
                            ard, rec["bazi"], (1, 2, 3, 4, 5))
                        return canon, lo_, hi_

                    canon, los, his = jax.vmap(per_rec)(recs_l)
                    syn_rc, lo_rc, hi_rc = rc_gather(ctx_l, aux_l, canon,
                                                     los, his)
                    return eval_rows(ctx_l, rctx_l, syn_rc, lo_rc, hi_rc,
                                     moment, risetime)

                m, nn, fs = jax.vmap(forward_one)(cbatch, moments, risetimes)
            return m, nn, fs[:, :r_max]  # [B_local, rc_max/r_max]

        return jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(
                    P(axis), P(axis), P(axis), P(axis), P(axis),
                    P(axis), P(axis), P(axis), P(axis),
                    P(sa), P(sa), P(sa),
                ),
                out_specs=(P(sa, axis), P(sa, axis), P(sa, axis)),
                # pallas_call out_shapes carry no vma annotations; the
                # forward is purely per-shard (no collectives), so the
                # varying-mesh-axes check adds nothing here
                check_vma=False,
            )
        )

    plan = GFShardedPlan(
        engine=eng, mesh=mesh, axis=axis, source_axis=source_axis,
        cfg=cfg, st=st, groups=groups,
        rc_of=rc_of, rc_max=rc_max, r_max=r_max,
        fwd_builder=fwd_builder,
        sharded_args=(ext, gfi, gfn, ix0, tab, recs, ctxd, rctxd, aux),
        built_stats=(extent, depth_range, time_range),
        origins=origins,
    )
    return plan


class _SubGeom:
    """Receiver-geometry view restricted to an index subset (duck-typed for
    plan_config, which reads .dist and .depth)."""

    def __init__(self, geom, idx):
        self.dist = geom.dist[idx]
        self.depth = geom.depth[idx]
        self.azi = geom.azi[idx]
        self.bazi = geom.bazi[idx]
