"""Sort-cost A/B for the hybrid's re-pack (VERDICT r3 items 5+8).

The sorted-continuation hybrid pays one 14-column lax.sort (~3.2-3.8ms
at ~506K rows) + one 4-column un-sort. Variants measured here:
  sort14   (key, o3, d3, atten3, bg3, ret)     — current production
  sort11   (key, o3, d3, atten3, ret)          — bg recomputed in-kernel
                                                 from ret's pixel id
  sort2    (key, idx)                          — then ONE bulk
           jnp.take of the (N, 12) payload: is an out-of-loop gather
           really the 21.5ms the in-loop profiler saw?
  unsort4  (ret, acc3)                         — the existing un-sort
  unsort1  (ret, packed-rgb-as-f32?)           — n/a; acc needs full f32

Usage: python benchmarks/sort_cost_ab.py   (real chip, quiet host)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 505856  # scene-sized blocked ray count (800x600 padded)


def run_interleaved(fns, args_map, reps=10, rounds=6):
    """args_map values are LISTS of distinct argument tuples, cycled per
    rep: pipelined same-args dispatches on this attachment get deduped
    and report absurd times (NOTES_r4)."""
    outs = {}
    for name, fn in fns.items():
        for a in args_map[name]:
            outs[name] = jax.block_until_ready(fn(*a))
    best = {name: float("inf") for name in fns}
    for _ in range(rounds):
        for name, fn in fns.items():
            variants = args_map[name]
            t0 = time.perf_counter()
            res = [fn(*variants[i % len(variants)])
                   for i in range(reps)]
            jax.block_until_ready(res)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    keys = [jnp.asarray(rng.integers(0, 1 << 24, N), jnp.int32)
            for _ in range(4)]
    cols = [jnp.asarray(rng.standard_normal(N), jnp.float32)
            for _ in range(12)]
    ret = jnp.arange(N, dtype=jnp.int32)
    payload = jnp.stack(cols, axis=-1)

    def heads(s):
        # keep EVERY sort operand live (XLA's sort simplifier deletes
        # unused payload operands, silently shrinking the measured
        # sort) while returning almost no data
        return tuple(c[:8] for c in s)

    @jax.jit
    def sort14(key, *cs):
        s = jax.lax.sort((key,) + cs, dimension=0, num_keys=1,
                         is_stable=True)
        return heads(s)

    @jax.jit
    def sort11(key, *cs):
        s = jax.lax.sort((key,) + cs, dimension=0, num_keys=1,
                         is_stable=True)
        return heads(s)

    @jax.jit
    def sort2_take(key, idx, payload):
        s = jax.lax.sort((key, idx), dimension=0, num_keys=1,
                         is_stable=True)
        g = jnp.take(payload, s[1], axis=0)
        # position-weighted sum: not permutation-invariant, so the full
        # gather cannot be pruned or algebraically bypassed
        w = idx.astype(jnp.float32)[:, None]
        return jnp.sum(g * w)

    @jax.jit
    def unsort4(ret, *cs):
        s = jax.lax.sort((ret,) + cs, dimension=0, num_keys=1,
                         is_stable=True)
        return heads(s)

    fns = {
        "sort14": sort14, "sort11": sort11,
        "sort2_take": sort2_take, "unsort4": unsort4,
    }
    args_map = {
        "sort14": [(k,) + tuple(cols[:12]) + (ret,) for k in keys],
        "sort11": [(k,) + tuple(cols[:9]) + (ret,) for k in keys],
        "sort2_take": [(k, ret, payload) for k in keys],
        # unsort keys are a permutation of arange; emulate with the
        # sorted-by-key order of each key variant
        "unsort4": [(k,) + tuple(cols[:3]) for k in keys],
    }
    best = run_interleaved(fns, args_map)
    best = {k: round(v, 3) for k, v in best.items()}
    best["n"] = N
    print(json.dumps(best))


if __name__ == "__main__":
    main()
