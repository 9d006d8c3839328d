"""Fused window-attention Pallas kernel vs a plain JAX reference: forward and
all gradients (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from sres_tpu.ops.pallas.window_attention import fused_window_attention

NW, T, C, H = 8, 64, 64, 4
HD = C // H


def _ref(x, wqkv, bqkv, wo, bo, bias, mask):
    nw, t, c = x.shape
    qkv = x.reshape(nw * t, c) @ wqkv + bqkv
    qkv = qkv.reshape(nw, t, 3, H, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("whqd,whkd->whqk", q, k) * (HD ** -0.5) + bias[None] + mask[:, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("whqk,whkd->whqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(nw * t, c)
    return (o @ wo + bo).reshape(nw, t, c)


def _inputs(seed=0, masked=False):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(scale=0.1, size=s).astype(np.float32))
    mask = jnp.where(mk(NW, T, T) > 0.1, -100.0, 0.0) if masked \
        else jnp.zeros((NW, T, T), jnp.float32)
    return (mk(NW, T, C), mk(C, 3 * C), mk(1, 3 * C), mk(C, C), mk(1, C),
            mk(H, T, T), mask)


def test_forward_matches():
    for masked in (False, True):
        args = _inputs(masked=masked)
        y = fused_window_attention(*args, H)
        yr = _ref(*args)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=3e-5, atol=3e-5)


def test_gradients_match():
    args = _inputs(1)

    def lf(*a):
        return jnp.sum(jnp.cos(fused_window_attention(*a, H)))

    def lr(*a):
        return jnp.sum(jnp.cos(_ref(*a)))

    gf = jax.grad(lf, argnums=tuple(range(6)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(6)))(*args)
    names = ["x", "wqkv", "bqkv", "wo", "bo", "bias"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                                   err_msg=f"grad mismatch: {n}")


def test_window_attention_sharded_grad():
    """The attention kernel composes with a dp mesh under plain GSPMD via
    its batch_partitioned sharding contract (ops/pallas/partition.py):
    the sharded jit runs per-shard — no activation all-gathers; weight/bias
    grads arrive through the partitioner's psum — and matches the unsharded
    gradients."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    args = _inputs(2)

    def lf(*a):
        return jnp.sum(jnp.cos(fused_window_attention(*a, H)))

    g0 = jax.grad(lf, argnums=tuple(range(6)))(*args)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    shard = [NamedSharding(mesh, P("data", None, None))] + \
        [NamedSharding(mesh, P()) for _ in range(5)] + \
        [NamedSharding(mesh, P("data", None, None))]
    sargs = tuple(jax.device_put(a, s) for a, s in zip(args, shard))
    jitted = jax.jit(jax.grad(lf, argnums=tuple(range(6))))
    hlo = jitted.lower(*sargs).compile().as_text()
    assert hlo.count("all-gather") == 0, "attention operands were gathered"
    g1 = jitted(*sargs)
    for i, (a, b) in enumerate(zip(g0, g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"sharded grad mismatch: arg {i}")


def test_fused_window_attention_16x16_windows():
    """16x16 windows (T=256) — the block-size cap keeps per-head score
    tensors VMEM-resident (round-1 verdict roadmap #4)."""
    import jax
    import jax.numpy as jnp
    from sres_tpu.ops.pallas.window_attention import fused_window_attention

    nw, t, c, h = 4, 256, 64, 4
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    x = jax.random.normal(ks[0], (nw, t, c), jnp.float32) * 0.3
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.float32) * 0.05
    bqkv = jnp.zeros((1, 3 * c))
    wo = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.05
    bo = jnp.zeros((1, c))
    bias = jax.random.normal(ks[3], (h, t, t), jnp.float32) * 0.02
    mask = jnp.zeros((nw, t, t), jnp.float32)

    def ref(x):
        hd = c // h
        qkv = (x.reshape(nw * t, c) @ wqkv + bqkv).reshape(nw, t, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, kk, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("whqd,whkd->whqk", q, kk) * hd ** -0.5 + bias[None]
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("whqk,whkd->whqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(nw * t, c)
        return (o @ wo + bo).reshape(nw, t, c)

    y = fused_window_attention(x, wqkv, bqkv, wo, bo, bias, mask, h)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x)),
                               rtol=3e-5, atol=3e-5)
    g1 = jax.grad(lambda x: jnp.sum(
        fused_window_attention(x, wqkv, bqkv, wo, bo, bias, mask, h) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)
