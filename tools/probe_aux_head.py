"""Break down VFMHead's 12 ms/group cost at the headline refine shape.

Times, via RTT-subtracted dispatch chains: the context resize(512->128),
the embed conv stack, the fuse conv+GN+GELU, each attention (self + cross
at 28x1024x8x64, pallas vs xla), the GEGLU FF, and the full decoder block.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

RTT = None


def rtt():
    global RTT
    if RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        RTT = min((lambda t0: (float(f(jnp.float32(0))), time.time() - t0)[1])(
            time.time()) for _ in range(3))
    return RTT


def chain(make_fn, *args, iters=8):
    @jax.jit
    def one(args, acc):
        return make_fn(*args, acc)

    acc = jnp.float32(0.0)
    float(one(args, acc))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = acc
        for _ in range(iters):
            r = one(args, r)
        float(r)
        best = min(best, max(time.time() - t0 - rtt(), 1e-9) / iters)
    return best * 1e3


def dep(x, acc):
    return x + (acc * 1e-12).astype(x.dtype)


def main():
    print("start", flush=True)
    from vfmseg_tpu.ops.attention import multi_head_attention
    from vfmseg_tpu.ops.resize import resize

    dt = jnp.bfloat16
    b, n, h, d = 28, 1024, 8, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, n, h, d), dt)
    k = jax.random.normal(key, (b, n, h, d), dt)
    v = jax.random.normal(key, (b, n, h, d), dt)

    for impl in ("pallas", "xla"):
        ms = chain(lambda q, k, v, acc: jnp.sum(
            multi_head_attention(dep(q, acc), k, v, impl=impl)[:, ::97, :, ::31]
        ).astype(jnp.float32), q, k, v)
        tf = 4 * b * h * n * n * d / 1e12
        print(json.dumps({"attn_28x1024x8x64": impl, "ms": round(ms, 3),
                          "tf_s": round(tf / (ms / 1e3), 1)}), flush=True)

    ctx = jax.random.normal(key, (b, 512, 512, 19), dt)
    ms = chain(lambda c, acc: jnp.sum(
        resize(dep(c, acc), size=(128, 128), method="bilinear")[:, ::31, ::31]
    ).astype(jnp.float32), ctx)
    print(json.dumps({"ctx_resize_512to128_c19_ms": round(ms, 3)}), flush=True)

    # embed conv stack shapes (2x2/s2 convs + GN + gelu)
    import flax.linen as nn

    class Embed(nn.Module):
        @nn.compact
        def __call__(self, c):
            e = nn.Conv(64, (2, 2), strides=(2, 2), padding="VALID", dtype=dt)(c)
            e = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt)(e)
            e = nn.gelu(e, approximate=False)
            e = nn.Conv(128, (2, 2), strides=(2, 2), padding="VALID", dtype=dt)(e)
            e = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt)(e)
            e = nn.gelu(e, approximate=False)
            e = nn.Conv(256, (1, 1), dtype=dt)(e)
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt)(e)

    ctx128 = jax.random.normal(key, (b, 128, 128, 19), dt)
    em = Embed()
    ev = em.init(key, ctx128)
    ms = chain(lambda p, c, acc: jnp.sum(
        em.apply(p, dep(c, acc))[:, ::7, ::7, ::31]).astype(jnp.float32),
        ev, ctx128)
    print(json.dumps({"embed_stack_ms": round(ms, 3)}), flush=True)

    class Fuse(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(256, (1, 1), dtype=dt)(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt)(x)
            return nn.gelu(x, approximate=False)

    feats = jax.random.normal(key, (b, 32, 32, 4096), dt)
    fu = Fuse()
    fv = fu.init(key, feats)
    ms = chain(lambda p, x, acc: jnp.sum(
        fu.apply(p, dep(x, acc))[:, ::7, ::7, ::31]).astype(jnp.float32),
        fv, feats)
    print(json.dumps({"fuse_ms": round(ms, 3)}), flush=True)

    # GEGLU FF at 28x1024x256
    class FF(nn.Module):
        @nn.compact
        def __call__(self, x):
            xg = nn.Dense(2048, dtype=dt)(x)
            a, g = jnp.split(xg, 2, axis=-1)
            return nn.Dense(256, dtype=dt)(a * nn.gelu(g, approximate=False))

    x_t = jax.random.normal(key, (b, n, 256), dt)
    ff = FF()
    pv = ff.init(key, x_t)
    ms = chain(lambda p, x, acc: jnp.sum(
        ff.apply(p, dep(x, acc))[:, ::97, ::31]).astype(jnp.float32), pv, x_t)
    print(json.dumps({"geglu_ff_ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
