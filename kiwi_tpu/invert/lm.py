"""Levenberg-Marquardt refinement with the reference's lmdif semantics.

Counterpart of minimize_lm (minimizer_engine.f90:729-874 + sminpack/lmdif.f):
minimize the vector of per-(receiver, component) misfits over a masked,
*normalized* subset of source parameters, with a forward-difference Jacobian
and a penalty clip to box limits.

The MINPACK lmdif algorithm itself is provided by scipy.optimize.leastsq
(the same published algorithm the reference links as sminpack); we pass the
reference's exact control parameters: ftol = xtol = sqrt(single-precision
machine eps) (minimizer_engine.f90:773), gtol = 0, maxfev = 500*(n+1),
factor = 0.01, unit diag with mode 2, and epsfcn = f32 machine eps so the
forward-difference steps match a single-precision forward model
(lmdif uses max(epsfcn, eps_machine); the reference's forward pass is f32).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import leastsq

F32_EPS = float(np.finfo(np.float32).eps)


def minimize_lm(engine, mask=None, subparam_mins=None, subparam_maxs=None):
    """Refine engine.source_params in place.

    mask: bool array over params (default: all True -- the reference
    requires set_source_params_mask first; here all-free is a usable
    default); subparam_mins/maxs: optional box limits in *unnormalized*
    units (minimizer commands set_source_subparams_limits).

    Returns (info, nfev, final_global_misfit).
    """
    from ..sources import get_source_model

    model = get_source_model(engine.source_type)
    params = engine.source_params.astype(np.float64).copy()
    norm = model.norm.astype(np.float64)
    if mask is None:
        mask = np.ones(model.nparams, dtype=bool)
    mask = np.asarray(mask, dtype=bool)
    idx = np.flatnonzero(mask)
    sub_norm = norm[idx]

    nfev = [0]

    def residuals(sub):
        sub = np.asarray(sub, dtype=np.float64)
        penalty = 0.0
        if subparam_mins is not None and subparam_maxs is not None:
            mins = np.asarray(subparam_mins, dtype=np.float64)
            maxs = np.asarray(subparam_maxs, dtype=np.float64)
            un = sub * sub_norm
            below = un < mins
            above = un > maxs
            penalty = (
                np.abs(un[below] - mins[below]) / np.abs(maxs[below] - mins[below])
            ).sum() + (
                np.abs(un[above] - maxs[above]) / np.abs(maxs[above] - mins[above])
            ).sum()
            un = np.clip(un, mins, maxs)
            sub = un / sub_norm
        p = params.copy()
        p[idx] = sub * sub_norm
        m, n, _fs = engine.misfits_for_source_batch(p.astype(np.float32)[None, :])
        nfev[0] += 1
        return np.asarray(m[0], dtype=np.float64) * (1.0 + penalty)

    sub0 = params[idx] / sub_norm
    n = sub0.size
    tol = float(np.sqrt(F32_EPS))
    sub, _cov, infodict, _mesg, ier = leastsq(
        residuals,
        sub0,
        full_output=True,
        ftol=tol,
        xtol=tol,
        gtol=0.0,
        maxfev=500 * (n + 1),
        epsfcn=F32_EPS,
        factor=0.01,
        diag=np.ones(n),
    )
    if ier == 8:
        ier = 4  # mirror minimizer_engine.f90:799

    params[idx] = np.asarray(sub) * sub_norm
    engine.set_source_params(engine.source_type, params.astype(np.float32))
    gm = engine.get_global_misfit()
    return ier, nfev[0], gm
