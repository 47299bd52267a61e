"""Price scan-stitch variants honestly (args-passed) on the real chip.

Variants: two int32 planes (current), one packed int64 plane, one
(P, 2)-shaped int32 plane, at G in {892, 3372}.

Run: env PYTHONPATH="/root/repo:/root/.axon_site" python benchmarks/profile_stitch_variants.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "SMM_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sparse_matrix_mult_tpu as smm  # noqa: F401  (enables x64)
from sparse_matrix_mult_tpu.types import INDEX_DTYPE

K = 5
big = np.int32(np.iinfo(np.int32).max)


def timeit(name, fn, *args):
    f1 = jax.jit(lambda *a: lax.fori_loop(0, 1, lambda t, c: fn(c, *a), jnp.float32(0)))
    fK = jax.jit(lambda *a: lax.fori_loop(0, K, lambda t, c: fn(c, *a), jnp.float32(0)))
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fK(*args)); tKs.append(time.perf_counter() - t0)
    per = (min(tKs) - min(t1s)) / (K - 1)
    print(f"{name:44s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    P = 4096
    rng = np.random.default_rng(0)
    for G, OC in [(892, 2_621_440), (3372, 10_485_760)]:
        keys = jnp.asarray(rng.integers(0, 2**30, size=(G, P)).astype(np.int32))
        vals = jnp.asarray(rng.standard_normal((G, P)).astype(np.float32))
        cnt = rng.integers(P // 2, P, size=G)
        offs_np = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        offs = jnp.asarray(offs_np)
        for x in (keys, vals, offs):
            x.block_until_ready()
        print(f"G={G} OC={OC}")

        def two_plane(carry, ks, vs, of, unroll):
            vs = vs + carry * 0
            bufs0 = (jnp.full(OC + P, big, jnp.int32), jnp.zeros(OC + P, jnp.float32))

            def step(c2, xs):
                k_l, v_l, o = xs
                return (
                    lax.dynamic_update_slice(c2[0], k_l, (o,)),
                    lax.dynamic_update_slice(c2[1], v_l, (o,)),
                ), None

            bufs, _ = lax.scan(step, bufs0, (ks, vs, of[:-1]), unroll=unroll)
            return carry + bufs[1][0] + bufs[0][0].astype(jnp.float32) * 1e-9

        def packed64(carry, ks, vs, of):
            vs = vs + carry * 0
            vb = lax.bitcast_convert_type(vs, jnp.int32)
            p = (ks.astype(jnp.int64) << 32) | (
                vb.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
            )
            buf0 = jnp.zeros(OC + P, jnp.int64)

            def step(c2, xs):
                p_l, o = xs
                return lax.dynamic_update_slice(c2, p_l, (o,)), None

            buf, _ = lax.scan(step, buf0, (p, of[:-1]), unroll=8)
            k_o = (buf >> 32).astype(jnp.int32)
            v_o = lax.bitcast_convert_type(buf.astype(jnp.int32), jnp.float32)
            return carry + v_o[0] + k_o[0].astype(jnp.float32) * 1e-9

        def packed2(carry, ks, vs, of):
            vs = vs + carry * 0
            vb = lax.bitcast_convert_type(vs, jnp.int32)
            kv = jnp.stack([ks, vb], axis=-1)  # (G, P, 2)
            buf0 = jnp.zeros((OC + P, 2), jnp.int32)

            def step(c2, xs):
                kv_l, o = xs
                return lax.dynamic_update_slice(c2, kv_l, (o, jnp.int32(0))), None

            buf, _ = lax.scan(step, buf0, (kv, of[:-1]), unroll=8)
            v_o = lax.bitcast_convert_type(buf[:, 1], jnp.float32)
            return carry + v_o[0] + buf[0, 0].astype(jnp.float32) * 1e-9

        timeit("two-plane unroll8", lambda c, a_, b_, o_: two_plane(c, a_, b_, o_, 8), keys, vals, offs)
        timeit("two-plane unroll16", lambda c, a_, b_, o_: two_plane(c, a_, b_, o_, 16), keys, vals, offs)
        timeit("packed int64 unroll8", packed64, keys, vals, offs)
        timeit("packed (P,2) int32 unroll8", packed2, keys, vals, offs)


if __name__ == "__main__":
    main()
