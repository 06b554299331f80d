"""Trace semantics and GF store tests (counterparts of test_sparse_trace.f90,
test_gfdb.f90)."""

import numpy as np
import jax.numpy as jnp

from kiwi_tpu.gf import GFStore, GFStoreBuilder
from kiwi_tpu.gf.trace import (
    dataspan,
    fnint,
    multiply_add_ref,
    pack_trace,
    sample_ext,
)


def test_fnint_half_away_from_zero():
    np.testing.assert_array_equal(fnint(np.array([0.5, -0.5, 1.5, -1.5, 2.4])), [1, -1, 2, -2, 2])


def test_dataspan_trims():
    assert dataspan([0, 0, 1, 2, 0, 0, 0]) == (2, 4)  # one trailing zero kept
    assert dataspan([1, 2, 3, 3, 3]) == (0, 2)  # static tail collapsed
    assert dataspan([0, 0, 0]) is None
    assert dataspan([0, 1, 0], itmin=10) == (11, 12)


def test_pack_trace():
    v, it0 = pack_trace([0, 0, 5, 6, 0, 0], 100)
    np.testing.assert_array_equal(v, [5, 6, 0])
    assert it0 == 102


def test_sample_ext_semantics():
    data = jnp.array([[1.0, 2.0, 3.0]])
    itmin = jnp.array([5])
    idx = jnp.arange(3, 11)
    out = np.asarray(sample_ext(data, itmin, idx))
    # zero before itmin=5; values 1,2,3 at 5,6,7; edge value 3 after
    np.testing.assert_allclose(out[0], [0, 0, 1, 2, 3, 3, 3, 3])


def test_multiply_add_integer_shift_and_endpoint_repeat():
    # mirror of sparse_trace.f90:597-707: static offset persists
    acc = np.zeros(12)
    multiply_add_ref(acc, 0, np.array([1.0, 2.0, 4.0]), itmin=2, factor=2.0, rshift=3.0)
    # trace occupies 2..4, shifted by 3 -> 5..7, last value repeats after
    np.testing.assert_allclose(acc, [0, 0, 0, 0, 0, 2, 4, 8, 8, 8, 8, 8])


def test_multiply_add_fractional_shift():
    acc = np.zeros(10)
    data = np.array([0.0, 1.0, 0.0])
    multiply_add_ref(acc, 0, data, itmin=3, rshift=1.5)
    # trace positioned at 4.5: sample j gets (1-frac)*x(j-1) + frac*x(j-2)
    # x at 3,4,5 = 0,1,0 -> out[5] = 0.5*x(4)+0.5*x(3) = 0.5; out[6]=0.5
    np.testing.assert_allclose(acc[5], 0.5)
    np.testing.assert_allclose(acc[6], 0.5)
    assert acc[:5].sum() == 0 and acc[7:].sum() == 0


def test_multiply_add_fractional_endpoint():
    # nonzero last value: edge extension applies under fractional shift too
    acc = np.zeros(10)
    data = np.array([2.0, 4.0])
    multiply_add_ref(acc, 0, data, itmin=0, rshift=2.25)
    # positions: x(0)=2, x(1)=4, extended 4 afterwards; shift 2.25
    # out[j] = 0.75*x(j-2) + 0.25*x(j-3)
    np.testing.assert_allclose(acc[2], 0.75 * 2)
    np.testing.assert_allclose(acc[3], 0.75 * 4 + 0.25 * 2)
    np.testing.assert_allclose(acc[4], 0.75 * 4 + 0.25 * 4)
    np.testing.assert_allclose(acc[9], 4.0)


def test_store_roundtrip(tmp_path):
    b = GFStoreBuilder(nx=4, nz=3, ng=10, dt=0.1, dx=50.0, dz=50.0, firstx=50.0)
    b.put_trace(0, 0, 0, np.array([1.0, 2.0, 3.0], dtype=np.float32), 7)
    b.put_trace(3, 2, 9, np.array([0.0, 5.0, 0.0, 0.0], dtype=np.float32), -2)
    store = b.build()

    assert store.nx == 4 and store.nz == 3 and store.ng == 10
    v, it0 = store.get_trace(0, 0, 0)
    np.testing.assert_array_equal(v, [1, 2, 3])
    assert it0 == 7
    v, it0 = store.get_trace(3, 2, 9)
    np.testing.assert_array_equal(v, [5, 0])  # leading zeros trimmed, one trailing zero
    assert it0 == -1
    assert store.get_trace(1, 1, 1) is None

    p = tmp_path / "store.npz"
    store.save(p)
    store2 = GFStore.load(p)
    np.testing.assert_array_equal(store.data, store2.data)
    np.testing.assert_array_equal(store.itmin, store2.itmin)
    assert store2.dt == store.dt and store2.firstx == store.firstx


def test_store_indices():
    b = GFStoreBuilder(nx=200, nz=200, ng=10, dt=0.1, dx=50.0, dz=50.0, firstx=50.0, firstz=0.0)
    store = b.build()
    assert store.get_indices(50.0, 0.0) == (0, 0)
    assert store.get_indices(74.0, 26.0) == (0, 1)
    assert store.get_indices(76.0, 24.0) == (1, 0)


def test_store_edge_padding_matches_extension():
    b = GFStoreBuilder(nx=1, nz=1, ng=1, dt=0.1, dx=1.0, dz=1.0)
    b.put_trace(0, 0, 0, np.array([1.0, 7.0], dtype=np.float32), 0)
    # another trace forces nt larger than 2
    b2 = GFStoreBuilder(nx=2, nz=1, ng=1, dt=0.1, dx=1.0, dz=1.0)
    b2.put_trace(0, 0, 0, np.array([1.0, 7.0], dtype=np.float32), 0)
    b2.put_trace(1, 0, 0, np.arange(6, dtype=np.float32) + 1.0, 0)
    store = b2.build()
    # row 0 must be edge-padded with 7.0
    np.testing.assert_allclose(store.data[0, 0, 0], [1, 7, 7, 7, 7, 7])
