"""QSEIS builder pipeline driven end-to-end against a synthetic stand-in
binary (the real F77 code is not in this image): input-deck writing,
output-table parsing with time reduction, MT-basis -> ig mapping, store
filling."""

import os
import stat
import textwrap

import numpy as np
import pytest

from kiwi_tpu.gf import qseis

FAKE_QSEIS = r'''#!/usr/bin/env python3
"""Stand-in for the qseis binary: reads the input deck from the file named
on stdin, emits deterministic traces value = f(dist_km, m6, comp)."""
import sys, numpy as np

fn = sys.stdin.readline().strip()
lines = [l for l in open(fn) if not l.startswith('#')]
vals = []
src_depth = float(lines[0].split()[0])
# lines: 0 src_depth, 1 rec_depth, 2 sw_equidistant/sw_d_unit,
# 3 no_distances, 4 distances, 5 t_start/t_window/no_t_samples
no_dist = int(lines[3].split()[0])
dists = [float(w) for w in lines[4].split()]
t_start, t_window, nts = (float(w) for w in lines[5].split()[:3])
t_reduce = float(lines[6].split()[1])  # km/s; output time is reduced
nts = int(nts)
# source line: "1 mxx myy mzz mxy myz mzx 'seis'"
src = None
for l in lines:
    if "'seis'" in l:
        src = [float(w) for w in l.split()[1:7]]
name = 'seis'
t = t_start + np.arange(nts) * (t_window / (nts - 1))
for ci, comp in enumerate(('tz', 'tr', 'tt')):
    cols = [t]
    for d in dists:
        ta = t + (d / t_reduce if t_reduce else 0.0)  # absolute time
        sig = (sum((i+1)*m for i, m in enumerate(src)) * (1+ci)
               * np.exp(-((ta - d/6.0)**2)) + d * 1e-3 + src_depth)
        cols.append(sig)
    arr = np.column_stack(cols)
    with open(name + '.' + comp, 'w') as f:
        f.write('header\n')
        np.savetxt(f, arr)
'''


@pytest.fixture()
def fake_bin(tmp_path):
    fn = tmp_path / "qseis"
    fn.write_text(FAKE_QSEIS)
    fn.chmod(fn.stat().st_mode | stat.S_IEXEC)
    return str(fn)


def test_qseis_config_deck_format():
    conf = qseis.QSeisConfig()
    conf.layered_model.set_model_from_string(
        "0.  5.8 3.2 2.6 1000 500\n30. 8.0 4.4 3.3 1500 600\n", units="ugly")
    conf.autoconf_modelling(
        {"firstx": 100e3, "nx": 20, "dx": 10e3, "dt": 0.5})
    deck = str(conf)
    # power-of-two sample count, km distances, model block present
    assert conf.no_t_samples & (conf.no_t_samples - 1) == 0
    assert "# source_depth_km" in deck and "'seis'" in deck
    assert deck.count("\n2\n") >= 1  # 2-layer model header


def test_qseis_builder_fills_store(fake_bin, tmp_path):
    gfdb_config = {"nx": 4, "nz": 2, "ng": 10, "dt": 0.5,
                   "dx": 10e3, "dz": 5e3, "firstx": 100e3, "firstz": 5e3}
    conf = qseis.QSeisConfig()
    conf.layered_model.set_model_from_string(
        "0.  5.8 3.2 2.6 1000 500\n30. 8.0 4.4 3.3 1500 600\n", units="ugly")
    conf.autoconf_modelling(gfdb_config)
    b = qseis.QSeisGFBuilder(gfdb_config, conf, tmp=str(tmp_path),
                             program=fake_bin)
    store = b.build()

    assert store.ng == 10
    # every (ix, iz, ig) in the mapping is present
    filled = {ig for ig in range(10) if store.get_trace(2, 1, ig) is not None}
    assert filled == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}

    # values follow the stand-in's formula: ig 1 (0-based 0) is the r
    # component of basis (1,1,0,0,0,0) -> coef (1*1+2*1) * (1+1)
    x = 100e3 + 2 * 10e3
    z = 5e3 + 1 * 5e3
    vals, itmin = store.get_trace(2, 1, 0)
    t = (itmin + np.arange(len(vals))) * store.dt
    expected = (1*1 + 2*1) * 2 * np.exp(-((t - (x/1e3)/6.0)**2)) + (x/1e3)*1e-3 + z/1e3
    scale = np.abs(expected).max()
    np.testing.assert_allclose(vals, expected, atol=scale*1e-5)

    # z component of the mzz basis goes to ig 8 (0-based 7), coef 3 * 1
    vals8, it8 = store.get_trace(2, 1, 7)
    t8 = (it8 + np.arange(len(vals8))) * store.dt
    exp8 = 3 * 1 * np.exp(-((t8 - (x/1e3)/6.0)**2)) + (x/1e3)*1e-3 + z/1e3
    np.testing.assert_allclose(vals8, exp8, atol=np.abs(exp8).max()*1e-5)


def test_qseis_missing_binary_error(tmp_path):
    r = qseis.QSeisRunner(tmp=str(tmp_path), program="/nonexistent/qseis")
    with pytest.raises(qseis.QSeisError, match="could not start qseis"):
        r.run(qseis.QSeisConfig())


FAKE_POEL = r'''#!/usr/bin/env python3
"""Stand-in for the poel binary: reads its input deck, writes one table per
selected component with value = f(component index, distance)."""
import sys, os, numpy as np

fn = sys.stdin.readline().strip()
lines = [l for l in open(fn) if not l.lstrip().startswith('#') and l.strip()]
# deck layout (non-comment lines): src line, "2", 2 stf rows, receiver_depth,
# sw_equidistant, no_distances, distances, "t_window no_t_samples", accuracy,
# sw 1-3, files 1-3, sw 4-10, files 4-10, sw 11-14, files 11-14, ...
rd = 4
sw_eq = int(lines[rd+1].split()[0])
nd = int(lines[rd+2].split()[0])
dists = [float(w) for w in lines[rd+3].split('|')[0].split()]
tw, nts = lines[rd+4].split('|')[0].split()[:2]
tw, nts = float(tw), int(nts)
if sw_eq:
    xs = np.linspace(dists[0], dists[1], nd)
else:
    xs = np.array(dists)
names = []
for k in (rd+7, rd+9, rd+11):
    names += [w.strip("'") for w in lines[k].split('|')[0].split()]
t = np.linspace(0.0, tw, nts)
for ci, name in enumerate(names):
    cols = [t] + [np.full(nts, (ci + 1) * 100.0 + x * 1e-3) for x in xs]
    with open(name, 'w') as f:
        f.write('header\n')
        np.savetxt(f, np.column_stack(cols))
'''


def test_poel_builder_fills_store(tmp_path):
    from kiwi_tpu.gf import poel

    fb = tmp_path / "poel"
    fb.write_text(FAKE_POEL)
    fb.chmod(fb.stat().st_mode | stat.S_IEXEC)

    gfdb_config = {"nx": 3, "nz": 2, "ng": 14, "dt": 0.5,
                   "dx": 50.0, "dz": 25.0, "firstx": 100.0, "firstz": 10.0}
    conf = poel.PoelConfig()
    b = poel.PoelGFBuilder(gfdb_config, conf, program=str(fb),
                           tmp=str(tmp_path))
    store = b.build()
    assert store.ng == 14
    # component uz -> ig 1 (0-based 0): value 1*100 + x*1e-3
    vals, itmin = store.get_trace(1, 0, 0)
    x = 100.0 + 1 * 50.0
    np.testing.assert_allclose(vals, 100.0 + x * 1e-3, rtol=1e-6)
    # component p -> ig 11 (0-based 10): value 11*100 + x*1e-3
    vals11, _ = store.get_trace(2, 1, 10)
    x2 = 100.0 + 2 * 50.0
    np.testing.assert_allclose(vals11, 1100.0 + x2 * 1e-3, rtol=1e-6)
