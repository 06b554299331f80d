"""Where do the eikonal chunk's 33 ms of pack_kinematics go?

wmeta at eikonal shapes ([96, 10, 169, 10, 2, 128] f32 = 1.66 GB) costs
~2 ms to write at HBM roofline; measured pack is ~33 ms.  Time the
candidate culprits separately.

Run: KIWI_BENCH_MAKEDB=0 python benchmark/micro_wmeta.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    B, R, P, NW, G, L = 96, 10, 169, 10, 2, 128
    rng = np.random.default_rng(0)
    # compact pre-broadcast source [B, R, P, G, NW] (13 MB)
    src = jnp.asarray(rng.normal(size=(B, R, P, G, NW)).astype(np.float32))
    cols = [jnp.asarray(rng.normal(size=(B, R, P, G)).astype(np.float32))
            for _ in range(NW)]

    def timeit(fn, *args, reps=4, trials=5):
        # reps shallow enough that reps x 1.66 GB outputs fit HBM; the
        # scalar-fetch RTT amortizes over reps (a BLOCKING single-rep
        # variant measured 34 ms flat across variants -- that was the
        # tunnel RTT, not the op)
        def fence(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            return float(jnp.ravel(leaf)[0])

        out = fn(*args)
        fence(out)
        del out
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(*args) for _ in range(reps)]
            fence(outs[-1])
            best = min(best, (time.time() - t0) / reps)
            del outs
        return best

    gb = B * R * P * NW * G * L * 4 / 1e9

    @jax.jit
    def bcast_only(s):
        w = jnp.swapaxes(s, -1, -2)  # [B,R,P,NW,G]
        return jnp.broadcast_to(w[..., None], (B, R, P, NW, G, L)) + 0.0

    t = timeit(bcast_only, src)
    print(f"swapaxes+broadcast+materialize: {t*1e3:7.2f} ms "
          f"({gb/t:.0f} GB/s of {gb:.2f} GB)", flush=True)

    @jax.jit
    def bcast_direct(s):
        # already [B,R,P,NW,G]-ordered source: broadcast alone
        return jnp.broadcast_to(s[..., None], s.shape + (L,)) + 0.0

    src2 = jnp.asarray(np.swapaxes(np.asarray(src), -1, -2).copy())
    t = timeit(bcast_direct, src2)
    print(f"broadcast alone:                {t*1e3:7.2f} ms ({gb/t:.0f} GB/s)",
          flush=True)

    @jax.jit
    def stack_swap_bcast(*cs):
        w = jnp.stack(cs, axis=-1)            # [B,R,P,G,NW]
        w = jnp.swapaxes(w, -1, -2)
        return jnp.broadcast_to(w[..., None], (B, R, P, NW, G, L)) + 0.0

    t = timeit(stack_swap_bcast, *cols)
    print(f"stack+swap+broadcast (pack's):  {t*1e3:7.2f} ms ({gb/t:.0f} GB/s)",
          flush=True)

    # the real pack on synthetic kinematics
    from kiwi_tpu.ops import synth_window as sw
    import dataclasses
    from kiwi_tpu import synth as ksynth

    C = P * G
    kin = {
        "f": jnp.asarray(rng.normal(size=(B, R, C, 6)).astype(np.float32)),
        "cos_l": cols[0].reshape(B, R, C),
        "sin_l": cols[1].reshape(B, R, C),
        "frac": jnp.asarray(rng.uniform(size=(B, R, C)).astype(np.float32)),
        "ish": jnp.zeros((B, R, C), jnp.int32),
        "ixs": jnp.zeros((B, R, C, 2), jnp.int32),
        "izs": jnp.zeros((B, R, C, 2), jnp.int32),
        "wsp": jnp.asarray(rng.uniform(size=(B, R, C, 4)).astype(np.float32)),
        "valid": jnp.ones((B, R, C), bool),
    }
    cfg = ksynth.SynthConfig(
        dt=0.1, dx=50.0, dz=50.0, firstx=50.0, firstz=0.0, ng=10, nt=64,
        ix0=0, nxw=42, iz0=0, nzw=20, out_it0=0, nt_out=128, s_base=-64,
        s_len=64, interpolate=True, xunder=1, zunder=1)

    pack = jax.jit(lambda k: sw.pack_kinematics(cfg, k, G))
    t = timeit(pack, kin)
    print(f"pack_kinematics (full):         {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
