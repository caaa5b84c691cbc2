#!/usr/bin/env python
"""On-device primitive costs (BENCHMARKS.md §6): sort, gather, scatter —
the numbers every wavefront-scheduling decision rests on.

Emits one JSON line per measurement. Run on the TPU host (or CPU with
JAX_PLATFORMS forced, for smoke).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force + warmup
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    n = int(2 ** 21)  # ~2M, the 1080p path pool
    key = jax.random.PRNGKey(0)
    keys24 = jax.random.randint(key, (n,), 0, 1 << 24, jnp.int32)
    f32s = [jax.random.uniform(jax.random.fold_in(key, i), (n,))
            for i in range(16)]
    results = {}

    # multi-operand lax.sort: the cost of physically reordering the whole
    # path-state carry in one fused op
    for ops in (2, 4, 8, 12, 16):
        f = jax.jit(lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1))
        dt = timeit(f, keys24, *f32s[:ops - 1])
        results[f"sort_{ops}op"] = dt
        print(json.dumps({"metric": f"lax.sort 2M x{ops} operands",
                          "value": round(dt * 1e3, 2), "unit": "ms"}))

    # flat gather (random permutation)
    perm = jax.random.permutation(key, n).astype(jnp.int32)
    f = jax.jit(lambda v, p: jnp.take(v, p))
    dt = timeit(f, f32s[0], perm)
    print(json.dumps({"metric": "jnp.take 2M f32 random", "value":
                      round(dt * 1e3, 2), "unit": "ms"}))

    # row gather of a packed [2M, 17] matrix (SVGF reprojection shape)
    mat = jnp.stack(f32s[:16] + [f32s[0]], axis=-1)
    f = jax.jit(lambda m, p: jnp.take(m, p, axis=0))
    dt = timeit(f, mat, perm)
    print(json.dumps({"metric": "jnp.take [2M,17] rows random",
                      "value": round(dt * 1e3, 2), "unit": "ms"}))

    # gather with SORTED (locally coherent) indices — does locality help?
    sorted_idx = jnp.sort(perm[:n])
    dt = timeit(f, mat, sorted_idx)
    print(json.dumps({"metric": "jnp.take [2M,17] rows sorted idx",
                      "value": round(dt * 1e3, 2), "unit": "ms"}))

    # scatter-add 2M
    f = jax.jit(lambda v, p: jnp.zeros((n,)).at[p].add(v))
    dt = timeit(f, f32s[0], perm)
    print(json.dumps({"metric": "scatter-add 2M", "value":
                      round(dt * 1e3, 2), "unit": "ms"}))

    # one-shot 16-operand sort vs sort(key,iota)+16 flat gathers
    f = jax.jit(lambda k, p, *vs: tuple(jnp.take(v, p) for v in vs))
    dt = timeit(f, keys24, perm, *f32s)
    print(json.dumps({"metric": "16 flat gathers 2M", "value":
                      round(dt * 1e3, 2), "unit": "ms"}))

    return 0


if __name__ == "__main__":
    sys.exit(main())
