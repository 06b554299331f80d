#!/usr/bin/env python
"""Replay the reference's scripted minimizer session (benchmark/mini.inp's
benchdb part) against the protocol server: 8 finite-source syntheses on the
analytic benchmark database, writing seismogram files each time.

usage: python benchmark/run_mini.py [workdir]
"""

import io
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def run(workdir):
    """Set up the workdir and replay mini.inp; returns timing dict.
    NOTE: chdirs into workdir (protocol file outputs are relative)."""
    os.makedirs(workdir, exist_ok=True)

    from kiwi_tpu import geo
    from kiwi_tpu.cli.minimizer import MinimizerServer
    from kiwi_tpu.gf.store import GFStore

    cache = os.environ.get("KIWI_BENCHDB", "/tmp/kiwi_tpu_benchdb.npz")
    dbfile = os.path.join(workdir, "benchdb.npz")
    if not os.path.exists(dbfile):
        if os.path.exists(cache):
            os.symlink(cache, dbfile)
        else:
            from kiwi_tpu.gf import elseis

            stf = np.array(
                [0, 0, 0, 0, 0, 0, .1, .2, .3, .4, .5, .6, .7, .8, .9, 1, 1, 1, 1, 1])
            print("building benchdb (one-time)...", file=sys.stderr)
            store = elseis.build_ahfull_store(
                nx=200, nz=200, dt=0.1, dx=50., dz=50., firstx=50., firstz=0.,
                material=(2300., 3200., 1600.), stf=stf)
            store.save(dbfile)

    # receivers at 3-4 km (the kiwibench geometry; the reference's izmit set
    # needs the 20000 km gemini database which is not shipped)
    rows = []
    for d in np.linspace(3000.0, 4000.0, 11):
        la, lo = geo.ne_to_latlon(np.radians(30.0), np.radians(70.0), float(d), 0.0)
        rows.append(f"{np.degrees(float(la)):.6f} {np.degrees(float(lo)):.6f} ned")
    with open(os.path.join(workdir, "receivers.table"), "w") as f:
        f.write("\n".join(rows) + "\n")

    with open(os.path.join(HERE, "mini.inp")) as f:
        script = f.read()

    os.chdir(workdir)
    srv = MinimizerServer()
    out = io.StringIO()
    # warm up (first synthesis compiles)
    lines = script.strip().splitlines()
    t0 = time.time()
    srv.run(io.StringIO("\n".join(lines[:7])), out)
    t_warm = time.time() - t0
    t0 = time.time()
    srv.run(io.StringIO("\n".join(lines[7:])), out)
    elapsed = time.time() - t0
    answers = out.getvalue()
    noks = [l for l in answers.splitlines() if ": nok" in l]
    assert not noks, noks
    n_synth = answers.count("output_seismograms: ok")
    return {"t_warm": t_warm, "elapsed": elapsed, "n_synth": n_synth,
            "answers": answers}


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kiwi_mini"
    r = run(workdir)
    t_warm, elapsed, n_synth = r["t_warm"], r["elapsed"], r["n_synth"]
    print(f"warmup (setup + compile + 1 synthesis): {t_warm:.1f}s", file=sys.stderr)
    print(f"{n_synth - 1} further syntheses + file output: {elapsed:.2f}s "
          f"({(n_synth - 1) / elapsed:.1f} models/s through the text protocol)",
          file=sys.stderr)
    print(r["answers"])


if __name__ == "__main__":
    main()
