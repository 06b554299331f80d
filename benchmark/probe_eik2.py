"""Find the eikonal end-to-end serialization: device floor is ~135 ms/batch
(disc 62 + 4 x 18.3 chunk) but the engine path measures ~327.

Measures, with scalar-fetch fences:
  1. host-issue time per global_misfits_for_source_batch call (no fence)
  2. steady-state per call, 6 calls in flight
  3. same with the overflow check disabled (suspect: a per-call fetch)
  4. same with host prep memoized (repeat batches -> prepare_batch cached?)

Run: KIWI_BENCH_MAKEDB=0 python benchmark/probe_eik2.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import get_store, make_engine  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    store, _mk = get_store(log)
    eng = make_engine(store)
    p = np.array(
        [0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
         0.0, 0.0, 250.0, 50.0, -50.0, 0.9, 0.3],
        dtype=np.float32,
    )
    eng.set_misfit_method("l2norm")
    eng.set_floating_shiftrange(0.0, 0.0)
    eng.set_source_constraints(
        [[0, 0, 50.0], [0, 0, 700.0]], [[0, 0, -1.0], [0, 0, 1.0]]
    )
    eng.set_source_params("eikonal", p)
    eng.set_synthetic_reference()

    batches = [np.tile(p, (B, 1)) for _ in range(6)]
    for i, b in enumerate(batches):
        b[:, 10] = np.linspace(200.0, 350.0, B).astype(np.float32) + 0.01 * i

    def e2e(b):
        return jnp.asarray(eng.global_misfits_for_source_batch(b))

    def fence(o):
        return float(jnp.ravel(o)[0])

    fence(e2e(batches[0]))  # compile

    # 1. host issue alone
    t0 = time.time()
    outs = [e2e(b) for b in batches]
    t_issue = (time.time() - t0) / len(batches)
    fence(outs[-1])
    log(f"1. host issue per call:        {t_issue*1e3:8.1f} ms")

    # 2. steady state
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [e2e(b) for b in batches]
        fence(outs[-1])
        best = min(best, (time.time() - t0) / len(batches))
    log(f"2. steady state per call:      {best*1e3:8.1f} ms "
        f"=> {B/best:.0f} MPS")

    # 3. overflow check disabled
    orig = eng._check_eik_overflow
    eng._check_eik_overflow = lambda: None
    try:
        fence(e2e(batches[0]))
        best3 = np.inf
        for _ in range(3):
            t0 = time.time()
            outs = [e2e(b) for b in batches]
            fence(outs[-1])
            best3 = min(best3, (time.time() - t0) / len(batches))
        log(f"3. no overflow fetch:          {best3*1e3:8.1f} ms "
            f"=> {B/best3:.0f} MPS")
    finally:
        eng._check_eik_overflow = orig

    # 4. host prep cost in isolation (same batches as the loop)
    from kiwi_tpu.sources import eikonal as eiksrc
    from kiwi_tpu.sources import get_source_model

    model = get_source_model(eng.source_type)
    ctx = eng.eikonal_context()
    t0 = time.time()
    for b in batches:
        named = eiksrc.named_params_batch(model.name, b)
        eiksrc.prepare_batch(named, eng.effective_dt, ctx)
    log(f"4. host prep per call:         {(time.time()-t0)/6*1e3:8.1f} ms")

    # 5. discretize-only issue+device, pipelined
    def disc_only(b):
        cbatch, *_ = eng._discretize_batch(b)
        return cbatch["north"]

    fence(disc_only(batches[0]))
    best5 = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [disc_only(b) for b in batches]
        fence(outs[-1])
        best5 = min(best5, (time.time() - t0) / len(batches))
    log(f"5. discretize-only per call:   {best5*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
