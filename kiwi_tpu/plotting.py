"""Plots and reports (matplotlib; replaces the reference's GMT/gmtpy stack).

Covers the workhorse figures of tunguska/plotting.py: reference-vs-synthetic
waveform comparisons, 1D/2D misfit cross sections from grid searches,
station maps, rupture-front snapshots, and a plain-HTML run report
(replacing the Cheetah templates of examples/report_templates)."""

from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_seismogram_comparison(engine, path, processing="plain"):
    """Reference vs synthetic traces per (receiver, component)."""
    plt = _mpl()
    syn = engine.get_processed_seismograms("synthetics", processing)
    layout = engine._rc_layout()
    dt = engine.store.dt
    nrec = len(engine.receivers)
    ncomp = max(len(r.components) for r in engine.receivers)
    fig, axes = plt.subplots(
        nrec, ncomp, figsize=(4 * ncomp, 1.8 * nrec), squeeze=False, sharex=True
    )
    used = np.zeros((nrec, ncomp), dtype=bool)
    counters = {}
    for irc, (irec, c) in enumerate(layout):
        k = counters.get(irec, 0)
        counters[irec] = k + 1
        ax = axes[irec][k]
        used[irec, k] = True
        sv, si = syn[irc]
        t = (si + np.arange(len(sv))) * dt
        ax.plot(t, sv, color="#c1272d", lw=0.8, label="synthetic")
        if irc in engine._refs:
            rv, ri = engine._refs[irc]
            tr = (ri + np.arange(len(rv))) * dt
            ax.plot(tr, rv, color="#222222", lw=0.8, label="reference")
        ax.set_ylabel(f"r{irec + 1} {c}", fontsize=8)
        ax.tick_params(labelsize=7)
    for irec in range(nrec):
        for k in range(ncomp):
            if not used[irec, k]:
                axes[irec][k].set_visible(False)
    axes[0][0].legend(fontsize=7, loc="upper right")
    axes[-1][0].set_xlabel("time [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_misfit_cross_section(grid, path, outer_norm="l2norm"):
    """1D misfit curve or 2D misfit map over the searched parameters
    (gridsearch.py's plot machinery)."""
    plt = _mpl()
    from .invert.gridsearch import make_global_misfits

    g, _ = make_global_misfits(grid.misfits_by_src, grid.norms_by_src,
                               outer_norm=outer_norm)
    names = [n for n, _v in grid.param_ranges]
    values = [np.asarray(v) for _n, v in grid.param_ranges]
    fig, ax = plt.subplots(figsize=(5, 3.4))
    if len(names) == 1:
        ax.plot(values[0], g, "o-", color="#1b5eab", ms=3)
        ax.set_xlabel(names[0])
        ax.set_ylabel("global misfit")
        i = int(np.nanargmin(g))
        ax.axvline(values[0][i], color="#c1272d", lw=0.8)
    elif len(names) == 2:
        gg = g.reshape(len(values[0]), len(values[1]))
        im = ax.pcolormesh(values[1], values[0], gg, shading="nearest", cmap="viridis")
        fig.colorbar(im, ax=ax, label="global misfit")
        ax.set_xlabel(names[1])
        ax.set_ylabel(names[0])
    else:
        # marginal minima per parameter
        ax.remove()
        fig, axes = plt.subplots(1, len(names), figsize=(3.2 * len(names), 3))
        shape = tuple(len(v) for v in values)
        gg = g.reshape(shape)
        for i, (nm, vv) in enumerate(zip(names, values)):
            other = tuple(j for j in range(len(names)) if j != i)
            prof = np.nanmin(gg, axis=other)
            axes[i].plot(vv, prof, "o-", ms=3)
            axes[i].set_xlabel(nm)
        axes[0].set_ylabel("min global misfit")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_station_map(engine, path):
    """Receivers + source epicenter in lat/lon."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 5))
    lats = [r.lat_deg for r in engine.receivers]
    lons = [r.lon_deg for r in engine.receivers]
    on = [r.enabled for r in engine.receivers]
    ax.scatter(
        [lo for lo, e in zip(lons, on) if e], [la for la, e in zip(lats, on) if e],
        marker="^", color="#1b5eab", label="receivers",
    )
    if not all(on):
        ax.scatter(
            [lo for lo, e in zip(lons, on) if not e],
            [la for la, e in zip(lats, on) if not e],
            marker="^", color="#bbbbbb", label="disabled",
        )
    ax.scatter([engine.src_lon_deg], [engine.src_lat_deg], marker="*", s=180,
               color="#c1272d", label="source")
    for i, (lo, la) in enumerate(zip(lons, lats)):
        ax.annotate(str(i + 1), (lo, la), fontsize=7, xytext=(3, 3),
                    textcoords="offset points")
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    ax.legend(fontsize=8)
    ax.set_aspect(1.0 / max(np.cos(np.radians(np.mean(lats))), 0.1))
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_rupture_front(engine, path):
    """Centroid positions colored by rupture onset time (the reference's
    rupture plots from psm info files)."""
    plt = _mpl()
    cbatch, _m, _r, _s, _g = engine._discretize_batch(engine.source_params[None, :])
    act = np.asarray(cbatch["active"][0])
    n = np.asarray(cbatch["north"][0])[act]
    e = np.asarray(cbatch["east"][0])[act]
    d = np.asarray(cbatch["depth"][0])[act]
    t = np.asarray(cbatch["time"][0])[act]
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    s0 = axes[0].scatter(e, n, c=t, cmap="magma", s=14)
    axes[0].set_xlabel("east [m]")
    axes[0].set_ylabel("north [m]")
    fig.colorbar(s0, ax=axes[0], label="onset time [s]")
    s1 = axes[1].scatter(e, -d, c=t, cmap="magma", s=14)
    axes[1].set_xlabel("east [m]")
    axes[1].set_ylabel("-depth [m]")
    fig.colorbar(s1, ax=axes[1], label="onset time [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def html_report(path, title, sections):
    """Minimal HTML run report: sections = [(heading, text, [image paths])]."""
    rows = [f"<html><head><title>{title}</title>",
            "<style>body{font-family:sans-serif;max-width:70em;margin:2em}"
            "pre{background:#f4f4f4;padding:0.8em}img{max-width:100%}</style>",
            f"</head><body><h1>{title}</h1>"]
    for heading, text, images in sections:
        rows.append(f"<h2>{heading}</h2>")
        if text:
            rows.append(f"<pre>{text}</pre>")
        for img in images:
            rel = os.path.relpath(img, os.path.dirname(path) or ".")
            rows.append(f'<img src="{rel}"/>')
    rows.append("</body></html>")
    with open(path, "w") as f:
        f.write("\n".join(rows))
    return path
