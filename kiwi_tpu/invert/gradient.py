"""Gradient-based source inversion: autodiff through the misfit engine.

No reference counterpart.  The Fortran stack's only smooth optimizer is
lmdif over forward-difference Jacobians (minimizer_engine.f90:729-874:
n+1 serial forwards per iteration).  Here the whole discretize ->
synthesize -> misfit chain is a pure JAX array program, so reverse-mode
autodiff (engine.global_misfits_and_grad) returns d(global misfit)/d(all
params) for ~2 forwards of work -- independent of the parameter count --
and a whole batch of starting points descends in parallel as ONE device
program per step.

`minimize_multistart` runs projected Adam on the engine's normalized
parameter scale (model.norm, the same normalization minimize_lm uses)
over B starts at once: the classic grid-search -> LM-refine pipeline
collapses to scatter-starts -> descend-together -> keep-the-best.
Box limits are enforced by projection (clip after each step), matching
the hard-limit semantics of the reference's grid expansion rather than
lm_forward_step's penalty trick (no penalty is needed when the iterate
itself stays inside the box).

Gradients are exact a.e. -- fractional 2-tap time shifts and bilinear GF
interpolation are piecewise linear in the source parameters -- so descent
behaves like on any piecewise-smooth objective; the floating-norm shift
argmin subgradient follows the selected shift, as subgradient descent
requires.
"""

from __future__ import annotations

import numpy as np

__all__ = ["minimize_multistart", "minimize_gradient", "covariance"]


def minimize_multistart(engine, p0_batch, mask=None, mins=None, maxs=None,
                        steps=150, lr=0.03, tol=0.0, mesh=None):
    """Descend B starting parameter vectors in parallel.

    p0_batch: f32[B, nparams] starting points.
    mask: bool[nparams], True = free (default all free).
    mins/maxs: optional box limits over the FREE subparams, unnormalized
        (same convention as minimize_lm); iterates are projected into the
        box after every step.
    steps / lr: Adam iterations and learning rate on a normalized scale.
        Adam's update magnitude is ~lr scale units per step regardless of
        the gradient's size, so the scale must reflect the PARAMETER's
        actual magnitude, not the model's norm column: moment-tensor
        components sit ~6 decades below their 7e18 norm, and norm-scaled
        steps would overshoot by exactly that factor.  The scale is the
        per-parameter max |start| over the batch, falling back to 1% of
        model.norm for parameters starting at 0.
    tol: early stop when the best global misfit improves by less than
        tol over a full sweep of 10 steps (0 = run all steps).
    mesh: optional jax.sharding.Mesh (parallel.make_mesh): shard the
        starts over the mesh's source axis -- multi-chip multi-start
        descent, no collectives needed (starts are independent).

    Returns (best_params f32[B, nparams], best_g f64[B], nsteps): the
    best iterate PER START (not just the winner), so multimodal misfit
    landscapes keep one solution per basin.
    """
    import optax

    from ..sources import get_source_model

    model = get_source_model(engine.source_type)
    rows = np.atleast_2d(np.asarray(p0_batch, dtype=np.float32)).copy()
    b = rows.shape[0]
    norm = model.norm.astype(np.float64)
    if mask is None:
        mask = np.ones(model.nparams, dtype=bool)
    idx = np.flatnonzero(np.asarray(mask, dtype=bool))
    start_mag = np.abs(rows[:, idx].astype(np.float64)).max(axis=0)
    sub_norm = np.where(start_mag > 0.0, start_mag, 0.01 * norm[idx])

    lo = None if mins is None else np.asarray(mins, np.float64) / sub_norm
    hi = None if maxs is None else np.asarray(maxs, np.float64) / sub_norm

    def project(x):
        if lo is not None:
            x = np.maximum(x, lo)
        if hi is not None:
            x = np.minimum(x, hi)
        return x

    def eval_batch(full_rows):
        """g, grad with rows bucketed by discretization grid shape (a free
        geometry parameter can quantize starts onto different grids); each
        bucket pads to the full B so one compiled program serves every
        composition (lm.shape_buckets)."""
        from .lm import shape_buckets

        g = np.zeros(b)
        grad = np.zeros((b, model.nparams))
        for sel, rb in shape_buckets(model, engine.effective_dt, full_rows, b):
            gi, gr = engine.global_misfits_and_grad(rb, mesh=mesh)
            g[sel] = gi[: sel.size]
            grad[sel] = gr[: sel.size]
        return g, grad

    x = project(rows[:, idx].astype(np.float64) / sub_norm)
    # cosine-decayed Adam: the constant-lr endgame oscillates across the
    # coupled strike/dip valleys; decaying to 5% of lr converges instead
    opt = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), 0.05))
    state = opt.init(x.astype(np.float32))

    best_g = np.full(b, np.inf)
    best_rows = rows.copy()
    last_best = np.inf
    nsteps = 0
    for step in range(steps):
        rows[:, idx] = (x * sub_norm).astype(np.float32)
        g, grad = eval_batch(rows)
        improved = g < best_g
        best_g[improved] = g[improved]
        best_rows[improved] = rows[improved]
        nsteps = step + 1
        if tol > 0.0 and step % 10 == 9:
            cur = float(best_g.min())
            if last_best - cur < tol:
                break
            last_best = cur
        # chain rule to the normalized scale: dG/dx = dG/dp * norm
        sub_grad = (grad[:, idx] * sub_norm).astype(np.float32)
        # a non-finite gradient row (a kink the a.e. guards don't cover)
        # must not freeze the whole batch: zero it, keep descending the rest
        sub_grad = np.where(np.isfinite(sub_grad), sub_grad, 0.0).astype(
            np.float32)
        updates, state = opt.update(sub_grad, state)
        x = project(np.asarray(optax.apply_updates(
            x.astype(np.float32), updates), dtype=np.float64))
    return best_rows, best_g, nsteps


def covariance(engine, mask=None, params=None):
    """Linearized least-squares parameter covariance at `params` (default:
    the engine's current source): cov = sigma^2 (J^T J)^{-1} with J the
    exact autodiff Jacobian of the misfit rows (the same rows minimize_lm
    minimizes) and sigma^2 = sum m^2 / (n_rows - n_free).

    Complements invert.MisfitGrid's bootstrap confidence intervals with
    the formal curvature-based uncertainty; no reference counterpart.
    Returns (cov [n_free, n_free], sigma2, J [RC, n_free]).  Uses the
    pseudo-inverse when J^T J is singular (a parameter the data does not
    constrain)."""
    from ..sources import get_source_model

    model = get_source_model(engine.source_type)
    if params is None:
        params = engine.source_params
    if mask is None:
        mask = np.ones(model.nparams, dtype=bool)
    idx = np.flatnonzero(np.asarray(mask, dtype=bool))

    m, J = engine.misfit_jacobian(params, mask=mask)
    m = m.astype(np.float64)
    J = J.astype(np.float64)
    # degrees of freedom count only ENABLED rc rows: disabled receivers'
    # rows come back as exact zeros and would silently deflate sigma^2
    n_rows = sum(
        1 for irec, _c in engine._rc_layout()
        if engine.receivers[irec].enabled
    )
    dof = max(n_rows - idx.size, 1)
    sigma2 = float((m * m).sum() / dof)
    jtj = J.T @ J
    try:
        cov = sigma2 * np.linalg.inv(jtj)
    except np.linalg.LinAlgError:
        cov = sigma2 * np.linalg.pinv(jtj)
    return cov, sigma2, J


def minimize_gradient(engine, mask=None, subparam_mins=None,
                      subparam_maxs=None, steps=150, lr=0.03, nstarts=1,
                      spread=0.1, seed=0):
    """Refine engine.source_params in place by multi-start gradient
    descent (the autodiff sibling of invert.minimize_lm).

    nstarts > 1 scatters extra starts around the current source, each
    free subparam perturbed uniformly within +-spread normalized units
    (clipped to the box); all starts descend in one batched program.

    Returns (best_global_misfit, nsteps, nstarts).
    """
    from ..sources import get_source_model

    model = get_source_model(engine.source_type)
    p0 = engine.source_params.astype(np.float32)
    if mask is None:
        mask = np.ones(model.nparams, dtype=bool)
    idx = np.flatnonzero(np.asarray(mask, dtype=bool))

    rows = np.tile(p0, (int(nstarts), 1))
    if nstarts > 1:
        rng = np.random.default_rng(seed)
        # same scale convention as minimize_multistart: the start's own
        # magnitude, 1% of model.norm for zero-valued parameters
        mag = np.abs(p0.astype(np.float64)[idx])
        scale = np.where(mag > 0.0, mag, 0.01 * model.norm.astype(np.float64)[idx])
        jitter = rng.uniform(-spread, spread, size=(nstarts - 1, idx.size))
        rows[1:, idx] = (rows[1:, idx].astype(np.float64)
                         + jitter * scale).astype(np.float32)
        if subparam_mins is not None:
            rows[1:, idx] = np.maximum(rows[1:, idx], subparam_mins)
        if subparam_maxs is not None:
            rows[1:, idx] = np.minimum(rows[1:, idx], subparam_maxs)

    best_rows, best_g, nsteps = minimize_multistart(
        engine, rows, mask=mask, mins=subparam_mins, maxs=subparam_maxs,
        steps=steps, lr=lr,
    )
    k = int(np.argmin(best_g))
    engine.set_source_params(engine.source_type, best_rows[k])
    return float(best_g[k]), nsteps, int(nstarts)
