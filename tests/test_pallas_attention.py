"""Fused Pallas attention vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.ops.masks import anticausal_mask, causal_mask
from vqcpcb_tpu.ops.pallas_attention import fused_attention
from vqcpcb_tpu.ops.relative_attention import subsampled_relative_bias


def xla_attention(q, k, v, mask, e1, e2):
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask[None, None]
    if e1 is not None:
        scores = scores + subsampled_relative_bias(q, e1, e2)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


@pytest.mark.parametrize("t,s,s_src,mask_kind,relative", [
    (16, 16, 16, "causal", True),
    (16, 16, 16, None, False),
    (32, 8, 8, "anticausal_rect", True),   # cross-attention, subsampled bias
    (24, 24, 24, "anticausal", True),
])
def test_fused_attention_matches_xla(t, s, s_src, mask_kind, relative):
    rng = np.random.RandomState(0)
    b, h, d = 2, 2, 8
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    e1 = e2 = None
    if relative:
        e1 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
        e2 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
    if mask_kind == "causal":
        mask = causal_mask(t)
    elif mask_kind == "anticausal":
        mask = anticausal_mask(t)
    elif mask_kind == "anticausal_rect":
        mask = anticausal_mask(s, sz_tgt=t)
    else:
        mask = None

    got = fused_attention(q, k, v, mask, e1, e2, interpret=True)
    want = xla_attention(q, k, v, mask, e1, e2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---- trainable fused attention (custom VJP + in-kernel dropout) -------------

@pytest.fixture(autouse=True)
def _exact_f32_dots(monkeypatch):
    """The trainable kernel defaults to bf16 MXU-input dots
    (VQCPCB_PALLAS_BF16_DOTS=1); the parity tests here assert tight
    f32 tolerances, so pin the exact mode. test_fused_train_grads_bf16_dots
    below covers the shipping bf16 default at its own tolerance."""
    monkeypatch.setenv("VQCPCB_PALLAS_BF16_DOTS", "0")


def _inputs(t=24, s=24, s_src=24, relative=True, seed=0):
    rng = np.random.RandomState(seed)
    b, h, d = 2, 2, 8
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    e1 = e2 = None
    if relative:
        e1 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
        e2 = jnp.asarray(rng.randn(h, s_src, d).astype(np.float32))
    mask = causal_mask(t)
    return q, k, v, mask, e1, e2


def _fused_train_loss(q, k, v, mask, e1, e2, dropout=0.0, seed_val=0):
    from vqcpcb_tpu.ops.pallas_attention import NEG_BIG, fused_attention_train
    b, h, t, d = q.shape
    s = k.shape[2]
    mask_f = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    bias = (subsampled_relative_bias(q, e1, e2).reshape(b * h, t, s)
            if e1 is not None else jnp.zeros((b * h, 1, 1), jnp.float32))
    seed = jnp.full((1,), seed_val, jnp.int32)
    interp = jax.default_backend() != "tpu"
    out = fused_attention_train(dropout, interp, seed, q, k, v, mask_f, bias)
    return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()


def _xla_loss(q, k, v, mask, e1, e2):
    out = xla_attention(q, k, v, mask, e1, e2)
    return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()


@pytest.mark.parametrize("relative", [True, False])
def test_fused_train_grads_match_xla_no_dropout(relative):
    q, k, v, mask, e1, e2 = _inputs(relative=relative)
    args = (q, k, v) + ((e1, e2) if relative else ())

    def f_fused(*a):
        qq, kk, vv = a[:3]
        ee1, ee2 = (a[3], a[4]) if relative else (None, None)
        return _fused_train_loss(qq, kk, vv, mask, ee1, ee2, dropout=0.0)

    def f_xla(*a):
        qq, kk, vv = a[:3]
        ee1, ee2 = (a[3], a[4]) if relative else (None, None)
        return _xla_loss(qq, kk, vv, mask, ee1, ee2)

    g_fused = jax.grad(f_fused, argnums=tuple(range(len(args))))(*args)
    g_xla = jax.grad(f_xla, argnums=tuple(range(len(args))))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-5)


def test_fused_train_dropout_statistics():
    """In-kernel dropout zeroes ~rate of the weights and preserves the
    softmax row-mean in expectation (inverted scaling).

    Runs everywhere since r4: the counter-based hash dropout
    (_dropout_keep) uses no pltpu PRNG primitives, so the Mosaic
    interpreter computes the exact hardware bits (the old stateful design
    was interpreter-stubbed AND measured kernel-context-dependent on real
    v5e — chain10 RB1). scripts/check_pallas_train_tpu.py re-runs this on
    hardware."""
    from vqcpcb_tpu.ops.pallas_attention import fused_attention_train
    b, h, t, d = 2, 4, 32, 8
    q = jnp.zeros((b, h, t, d))
    k = jnp.zeros((b, h, t, d))
    v = jnp.asarray(np.eye(t, d, dtype=np.float32))[None, None].repeat(
        b, 0).repeat(h, 1)
    mask = jnp.zeros((t, t), jnp.float32)
    bias = jnp.zeros((b * h, 1, 1), jnp.float32)
    seed = jnp.full((1,), 7, jnp.int32)
    # uniform weights 1/t; with dropout, kept entries scale by 1/(1-p)
    rate = 0.25
    interp = jax.default_backend() != "tpu"
    out = fused_attention_train(rate, interp, seed, q, k, v, mask, bias)
    got = np.asarray(out)
    base = np.asarray(fused_attention_train(0.0, interp, seed, q, k, v, mask,
                                            bias))
    kept = got != 0.0
    frac = kept[..., :].mean()
    assert abs(frac - (1 - rate)) < 0.03
    # rtol covers the MXU's single-pass-bf16 rounding of the in-kernel
    # w @ v dot on real hardware (measured 2e-3; interpret mode is exact)
    np.testing.assert_allclose(got[kept],
                               (base / (1 - rate))[kept], rtol=5e-3)
    # deterministic given the seed
    out2 = fused_attention_train(rate, interp, seed, q, k, v, mask, bias)
    np.testing.assert_array_equal(got, np.asarray(out2))


def _xla_dropout_replica_loss(q, k, v, mask, e1, e2, rate, keep):
    """The dropped forward rebuilt in plain XLA with the SAME keep bits
    (_dropout_keep is a pure function, so this is exact, not statistical) —
    jax.grad through it is autodiff ground truth for the custom VJP.
    `keep` is precomputed (b, h, t, s) because the two kernel families map
    grid steps to seed offsets differently (b-major vs the relbias (H, B)
    grid's h-major)."""
    from vqcpcb_tpu.ops.pallas_attention import NEG_BIG
    mask_f = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + mask_f[None, None]
    scores = scores + subsampled_relative_bias(q, e1, e2)
    w = jax.nn.softmax(scores, axis=-1)
    w = jnp.where(keep, w * (1.0 / (1.0 - rate)), 0.0)
    out = jnp.einsum("bhts,bhsd->bhtd", w, v)
    return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()


def test_fused_train_dropout_vjp_finite_difference():
    """With a fixed seed the dropped function is deterministic, so the
    custom VJP must agree with (a) jax.grad through an exact plain-XLA
    replica of the dropped forward — the sharp check — and (b) central
    finite differences.

    The fd check runs under jax.default_matmul_precision('float32'):
    on TPU the DEFAULT precision feeds f32 matmuls bf16 inputs, so a 1e-3
    perturbation drowns in input rounding and the fd quotient is noise
    (chain12 RB1: fd 13.36 vs analytic 16.84 — while the analytic grad was
    BIT-IDENTICAL to the XLA replica's; the kernels were right, the probe
    was broken). Runs everywhere since r4."""
    from vqcpcb_tpu.ops.pallas_attention import _dropout_keep
    q, k, v, mask, e1, e2 = _inputs(t=16, s=16, s_src=16)
    b, h, tt, _ = q.shape
    s = k.shape[2]
    # plain kernel: (b*h,) grid, b-major seed offsets
    keep = jnp.stack([
        _dropout_keep((tt, s), 0.3, jnp.asarray(3 + gi, jnp.int32))
        for gi in range(b * h)]).reshape(b, h, tt, s)

    with jax.default_matmul_precision("float32"):
        def f(qq):
            return _fused_train_loss(qq, k, v, mask, e1, e2, dropout=0.3,
                                     seed_val=3)

        def f_xla(qq):
            return _xla_dropout_replica_loss(qq, k, v, mask, e1, e2,
                                             rate=0.3, keep=keep)

        g = jax.grad(f)(q)
        g_xla = jax.grad(f_xla)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_xla),
                                   rtol=2e-4, atol=2e-5)
        rng = np.random.RandomState(5)
        u = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
        eps = 1e-3
        fd = (float(f(q + eps * u)) - float(f(q - eps * u))) / (2 * eps)
        analytic = float((g * u).sum())
    assert abs(fd - analytic) < 5e-2 * max(1.0, abs(analytic)), (fd, analytic)


def test_mha_training_path_uses_fused_kernel(monkeypatch):
    """MultiheadAttention(training=True) through the fused path matches the
    XLA path at dropout=0 (interpret mode via monkeypatched gates)."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    from vqcpcb_tpu.ops.attention import MultiheadAttention

    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    # this test pins the UNPACKED routing; the packed default (r4 ON) is
    # covered by test_mha_training_path_uses_packed_kernel
    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: False)
    orig = pa.fused_attention_train
    orig_rb = pa.fused_attention_train_relbias

    def interp(dropout_rate, interpret, *a):
        return orig(dropout_rate, True, *a)

    def interp_rb(dropout_rate, interpret, *a):
        # relbias default ON since r4: with the train gate patched True the
        # MHA routes here, so it needs the same interpret shim on CPU
        return orig_rb(dropout_rate, True, *a)

    monkeypatch.setattr(pa, "fused_attention_train", interp)
    monkeypatch.setattr(pa, "fused_attention_train_relbias", interp_rb)

    mha = MultiheadAttention(
        embed_dim=16, num_heads=2, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=4, num_channels_q=4, num_events_q=4,
        dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    mask = causal_mask(16)
    out_fused, w = mha.apply(params, x, x, x, attn_mask=mask, training=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert w is None
    out_xla, _ = mha.apply(params, x, x, x, attn_mask=mask, training=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_fused_train_grads_bf16_dots(monkeypatch):
    """The shipping default (VQCPCB_PALLAS_BF16_DOTS=1) rounds only the
    matmul INPUTS to bf16, keeping f32 accumulation and an f32 softmax/VJP —
    grads must still track the exact-f32 XLA path to bf16-mantissa
    precision (~2^-8 relative)."""
    monkeypatch.setenv("VQCPCB_PALLAS_BF16_DOTS", "1")
    q, k, v, mask, e1, e2 = _inputs(relative=True)
    args = (q, k, v, e1, e2)

    def f_fused(*a):
        return _fused_train_loss(a[0], a[1], a[2], mask, a[3], a[4],
                                 dropout=0.0)

    def f_xla(*a):
        return _xla_loss(a[0], a[1], a[2], mask, a[3], a[4])

    out_fused = f_fused(*args)
    out_xla = f_xla(*args)
    np.testing.assert_allclose(float(out_fused), float(out_xla), rtol=2e-2)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gx in zip(g_fused, g_xla):
        scale = max(1e-3, float(jnp.abs(gx).max()))
        np.testing.assert_allclose(np.asarray(gf) / scale,
                                   np.asarray(gx) / scale,
                                   rtol=3e-2, atol=3e-2)


# ---- fully-fused relative-bias kernel (in-kernel skew) ----------------------

def _relbias_loss(q, k, v, mask, e1, e2, dropout=0.0, seed_val=0):
    from vqcpcb_tpu.ops.pallas_attention import (
        NEG_BIG, fused_attention_train_relbias)
    mask_f = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    seed = jnp.full((1,), seed_val, jnp.int32)
    interp = jax.default_backend() != "tpu"
    out = fused_attention_train_relbias(dropout, interp, seed, q, k, v,
                                        mask_f, e1, e2)
    return out, (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()


@pytest.mark.parametrize("t,s,mask_kind", [
    (24, 24, "causal"),
    (32, 8, "anticausal_rect"),    # subsampled, ratio 4
    (16, 16, None),
    (96, 96, "causal"),            # packed table spans two 128-lane tiles
])
def test_relbias_fused_forward_matches_xla(t, s, mask_kind):
    """The in-kernel log-shift skew reproduces the XLA pad/reshape skew."""
    q, k, v, _, e1, e2 = _inputs(t=t, s=s, s_src=s)
    if mask_kind == "causal":
        mask = causal_mask(t)
    elif mask_kind == "anticausal_rect":
        mask = anticausal_mask(s, sz_tgt=t)
    else:
        mask = jnp.zeros((t, s), jnp.float32)
    got, _ = _relbias_loss(q, k, v, mask, e1, e2)
    want = xla_attention(q, k, v, mask, e1, e2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,s", [(24, 24), (32, 8)])
def test_relbias_fused_grads_match_xla(t, s):
    """q/k/v/e1/e2 gradients through the in-kernel skew transpose (mirrored
    right-shift + accumulated dE) match autodiff of the XLA path."""
    q, k, v, _, e1, e2 = _inputs(t=t, s=s, s_src=s)
    mask = causal_mask(t) if t == s else anticausal_mask(s, sz_tgt=t)
    args = (q, k, v, e1, e2)

    def f_fused(*a):
        return _relbias_loss(a[0], a[1], a[2], mask, a[3], a[4])[1]

    def f_xla(*a):
        return _xla_loss(a[0], a[1], a[2], mask, a[3], a[4])

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-5)
    # e2's offset-0 row is never validly addressed — its grad must be zero
    np.testing.assert_array_equal(np.asarray(g_fused[4][:, 0, :]), 0.0)
    np.testing.assert_allclose(np.asarray(g_xla[4][:, 0, :]), 0.0, atol=1e-7)


def test_mha_training_path_uses_relbias_kernel(monkeypatch):
    """MultiheadAttention(training=True) routes through the fully-fused
    relative-bias kernel when VQCPCB_PALLAS_RELBIAS is on, and matches the
    XLA path at dropout=0."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    from vqcpcb_tpu.ops.attention import MultiheadAttention

    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_relbias", lambda: True)
    # pin the UNPACKED routing (packed default r4 ON has its own test)
    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: False)
    calls = []
    orig = pa.fused_attention_train_relbias

    def interp(dropout_rate, interpret, *a):
        calls.append(1)
        return orig(dropout_rate, True, *a)

    monkeypatch.setattr(pa, "fused_attention_train_relbias", interp)

    mha = MultiheadAttention(
        embed_dim=16, num_heads=2, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=4, num_channels_q=4, num_events_q=4,
        dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    mask = causal_mask(16)
    out_fused, w = mha.apply(params, x, x, x, attn_mask=mask, training=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert w is None and calls
    out_xla, _ = mha.apply(params, x, x, x, attn_mask=mask, training=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_inference_fused_attention_relbias_route(monkeypatch):
    """fused_attention (inference) routes through the in-kernel-skew kernel
    when VQCPCB_PALLAS_RELBIAS is on and still matches the XLA path."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    monkeypatch.setattr(pa, "use_pallas_relbias", lambda: True)
    q, k, v, _, e1, e2 = _inputs(t=24, s=24, s_src=24)
    mask = causal_mask(24)
    got = pa.fused_attention(q, k, v, mask, e1, e2, interpret=True)
    want = xla_attention(q, k, v, mask, e1, e2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_relbias_dropout_vjp_finite_difference():
    """Fixed-seed dropout through the fully-fused relative-bias kernel: the
    custom VJP must agree with jax.grad through an exact plain-XLA replica
    (same keep bits at the kernel's seed offset — h*B + b under the (H, B)
    grid) and with central finite differences.

    This exact fd check FAILED on real v5e twice for two different reasons:
    the old stateful pltpu.prng_* design genuinely decorrelated the fwd/bwd
    masks (chain10 RB1, fd 8.31 vs analytic 13.49), and after the
    counter-hash rewrite the PROBE itself was broken — TPU default matmul
    precision feeds bf16 inputs, so 1e-3 perturbations drown in rounding
    (chain12 RB1; the analytic grad was bit-identical to the XLA replica).
    Hence the f32-precision context + the replica comparison."""
    from vqcpcb_tpu.ops.pallas_attention import _dropout_keep
    q, k, v, mask, e1, e2 = _inputs(t=16, s=16, s_src=16)
    b, h, tt, _ = q.shape
    s = k.shape[2]
    # relbias kernel: (H, B) grid, h-major seed offsets
    keep = jnp.stack([
        _dropout_keep((tt, s), 0.3, jnp.asarray(3 + hi * b + bi, jnp.int32))
        for hi in range(h) for bi in range(b)]
    ).reshape(h, b, tt, s).transpose(1, 0, 2, 3)

    with jax.default_matmul_precision("float32"):
        def f(qq):
            return _relbias_loss(qq, k, v, mask, e1, e2, dropout=0.3,
                                 seed_val=3)[1]

        def f_xla(qq):
            return _xla_dropout_replica_loss(qq, k, v, mask, e1, e2,
                                             rate=0.3, keep=keep)

        g = jax.grad(f)(q)
        g_xla = jax.grad(f_xla)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_xla),
                                   rtol=2e-4, atol=2e-5)
        rng = np.random.RandomState(5)
        u = jnp.asarray(rng.randn(*q.shape).astype(np.float32))
        eps = 1e-3
        fd = (float(f(q + eps * u)) - float(f(q - eps * u))) / (2 * eps)
        analytic = float((g * u).sum())
    assert abs(fd - analytic) < 5e-2 * max(1.0, abs(analytic)), (fd, analytic)


def test_fused_train_grad_placeholder_bias_length1_target():
    """Regression (ADVICE r2): with the (B*H, 1, 1) zero placeholder bias and
    a length-1 target (t == 1, s > 1), the bwd used to return a (B*H, 1, s)
    cotangent for the (B*H, 1, 1) primal, which custom_vjp rejects."""
    rng = np.random.RandomState(3)
    b, h, t, s, d = 2, 2, 1, 16, 8
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    mask = jnp.zeros((t, s), jnp.float32)

    def f_fused(qq, kk, vv):
        return _fused_train_loss(qq, kk, vv, mask, None, None, dropout=0.0)

    def f_xla(qq, kk, vv):
        return _xla_loss(qq, kk, vv, mask, None, None)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-5)


# ---- packed (B, L, H*d) natural-layout relbias path --------------------------

def _pack_bhtd(x):
    """(B, H, L, d) -> (B, L, H*d), heads contiguous along the lane axis."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _packed_loss(q, k, v, mask, e1, e2, dropout=0.0, seed_val=0):
    from vqcpcb_tpu.ops.pallas_attention import (
        NEG_BIG, fused_attention_train_relbias_packed)
    h = q.shape[1]
    mask_f = jnp.maximum(mask.astype(jnp.float32), NEG_BIG)
    seed = jnp.full((1,), seed_val, jnp.int32)
    interp = jax.default_backend() != "tpu"
    out = fused_attention_train_relbias_packed(
        dropout, interp, h, seed, _pack_bhtd(q), _pack_bhtd(k),
        _pack_bhtd(v), mask_f, e1, e2)
    # unpack to (B, H, T, d) so the loss weighting matches _relbias_loss
    b, t, e_dim = out.shape
    out = out.reshape(b, t, h, e_dim // h).transpose(0, 2, 1, 3)
    return out, (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()


@pytest.mark.parametrize("t,s,dropout", [
    (24, 24, 0.0),
    (32, 8, 0.0),       # subsampled cross-attention geometry, ratio 4
    (24, 24, 0.3),      # same (H, B)-grid seed offsets -> identical masks
])
def test_relbias_packed_bitmatches_unpacked(t, s, dropout):
    """The packed wrapper runs the SAME kernel bodies as the unpacked one —
    outputs and every gradient must be bit-identical (not just close),
    including the regenerated dropout masks."""
    q, k, v, _, e1, e2 = _inputs(t=t, s=s, s_src=s)
    mask = causal_mask(t) if t == s else anticausal_mask(s, sz_tgt=t)

    def f_packed(*a):
        return _packed_loss(a[0], a[1], a[2], mask, a[3], a[4],
                            dropout=dropout, seed_val=7)[1]

    def f_unpacked(*a):
        return _relbias_loss(a[0], a[1], a[2], mask, a[3], a[4],
                             dropout=dropout, seed_val=7)[1]

    args = (q, k, v, e1, e2)
    got, g_packed = jax.value_and_grad(f_packed, argnums=(0, 1, 2, 3, 4))(*args)
    want, g_unpacked = jax.value_and_grad(f_unpacked,
                                          argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for gp, gu in zip(g_packed, g_unpacked):
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(gu))


@pytest.mark.parametrize("h,d,t,s,dropout", [
    (4, 64, 16, 16, 0.0),   # flagship head width: hpb=2, two 128-lane blocks
    (4, 64, 32, 8, 0.0),    # same, subsampled cross geometry (ratio 4)
    (4, 64, 16, 16, 0.3),   # dropout streams must match per GLOBAL head
    (2, 128, 16, 16, 0.0),  # lane-aligned head: hpb=1
])
def test_relbias_packed_lane_tile_blocking(h, d, t, s, dropout):
    """The Mosaic-legal packed blocking (chain19 fix): when d tiles 128,
    grid steps cover 128//d heads per 128-lane block and slice each head
    statically in-kernel. Must stay bit-identical to the unpacked path —
    including dropout masks, which are indexed per global head."""
    from vqcpcb_tpu.ops.pallas_attention import _packed_heads_per_block
    assert _packed_heads_per_block(h, d) == 128 // d
    rng = np.random.RandomState(3)
    b = 2
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * (d ** -0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    e1 = jnp.asarray(rng.randn(h, s, d).astype(np.float32))
    e2 = jnp.asarray(rng.randn(h, s, d).astype(np.float32))
    mask = causal_mask(t) if t == s else anticausal_mask(s, sz_tgt=t)

    def f_packed(*a):
        return _packed_loss(a[0], a[1], a[2], mask, a[3], a[4],
                            dropout=dropout, seed_val=11)[1]

    def f_unpacked(*a):
        return _relbias_loss(a[0], a[1], a[2], mask, a[3], a[4],
                             dropout=dropout, seed_val=11)[1]

    args = (q, k, v, e1, e2)
    got, g_packed = jax.value_and_grad(f_packed, argnums=(0, 1, 2, 3, 4))(*args)
    want, g_unpacked = jax.value_and_grad(f_unpacked,
                                          argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for gp, gu in zip(g_packed, g_unpacked):
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(gu))


def test_mha_training_path_uses_packed_kernel(monkeypatch):
    """MultiheadAttention(training=True) routes through the packed kernel
    when VQCPCB_PALLAS_PACKED_QKV is on, skips the head transposes, and
    matches the XLA path at dropout=0."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    from vqcpcb_tpu.ops.attention import MultiheadAttention

    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: True)
    calls = []
    orig = pa.fused_attention_train_relbias_packed

    def interp(dropout_rate, interpret, *a):
        calls.append(1)
        return orig(dropout_rate, True, *a)

    monkeypatch.setattr(pa, "fused_attention_train_relbias_packed", interp)

    mha = MultiheadAttention(
        embed_dim=16, num_heads=2, attention_bias_type="relative_attention",
        num_channels_k=4, num_events_k=4, num_channels_q=4, num_events_q=4,
        dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    mask = causal_mask(16)
    out_fused, w = mha.apply(params, x, x, x, attn_mask=mask, training=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert w is None and calls
    out_xla, _ = mha.apply(params, x, x, x, attn_mask=mask, training=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_mha_packed_cross_attention_route(monkeypatch):
    """Cross-attention (query is not key, rectangular mask, subsampled bias)
    through the packed route matches the XLA path."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    from vqcpcb_tpu.ops.attention import MultiheadAttention

    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: True)
    orig = pa.fused_attention_train_relbias_packed
    monkeypatch.setattr(
        pa, "fused_attention_train_relbias_packed",
        lambda dr, it, *a: orig(dr, True, *a))

    mha = MultiheadAttention(
        embed_dim=16, num_heads=2,
        attention_bias_type="relative_attention_target_source",
        num_channels_k=1, num_events_k=4, num_channels_q=4, num_events_q=4,
        dropout=0.0)
    rng = np.random.RandomState(1)
    xq = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    xk = jnp.asarray(rng.randn(2, 4, 16).astype(np.float32))
    params = mha.init(jax.random.PRNGKey(0), xq, xk, xk)
    mask = anticausal_mask(4, sz_tgt=16)
    out_fused, w = mha.apply(params, xq, xk, xk, attn_mask=mask,
                             training=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert w is None
    out_xla, _ = mha.apply(params, xq, xk, xk, attn_mask=mask, training=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


# ---- narrow causal relbias table (VQCPCB_RELBIAS_NARROW) --------------------

@pytest.mark.parametrize("t,s,dropout", [(96, 96, 0.0), (96, 96, 0.2),
                                         (256, 256, 0.0),
                                         # s multiple of 128: narrow wp ==
                                         # src_len, the backward's no-pad
                                         # branch (Mosaic rejected the
                                         # (t, 0) pad on-chip, chain11)
                                         (128, 128, 0.2)])
def test_relbias_narrow_causal_bitmatches_wide(t, s, dropout, monkeypatch):
    """Under a strictly causal mask the narrow e1-only table is
    mathematically exact: every circular-wrap lane lands where softmax
    underflowed to exactly 0.0. Numerically the grads may differ at FP
    reassociation level only (the narrower zero-padded contractions let
    XLA pick a different reduction tree), so: loss bit-equal at matching
    pad widths, grads at ~1e-6 absolute; e2 grad exactly zero."""
    import vqcpcb_tpu.ops.pallas_attention as pa

    q, k, v, _, e1, e2 = _inputs(t=t, s=s, s_src=s)
    mask = causal_mask(t)

    def run(narrow):
        if narrow:
            monkeypatch.setenv("VQCPCB_RELBIAS_NARROW", "1")
            ctx = pa.relbias_causal_scope()
        else:
            monkeypatch.delenv("VQCPCB_RELBIAS_NARROW", raising=False)
            import contextlib
            ctx = contextlib.nullcontext()

        def f(*a):
            with ctx:
                return _relbias_loss(a[0], a[1], a[2], mask, a[3], a[4],
                                     dropout=dropout, seed_val=7)[1]
        loss, grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4))(q, k, v, e1, e2)
        return loss, grads

    loss_w, g_w = run(False)
    loss_n, g_n = run(True)
    np.testing.assert_allclose(np.asarray(loss_n), np.asarray(loss_w),
                               rtol=1e-6, atol=0)
    for gn, gw in zip(g_n, g_w):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(gw),
                                   rtol=1e-5, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(g_n[4]), 0.0)  # e2 grad


def test_relbias_narrow_packed_bitmatches_wide(monkeypatch):
    """Same bit-parity through the PACKED (B, L, H*d) kernel pair."""
    import vqcpcb_tpu.ops.pallas_attention as pa

    t = s = 96
    h, d, b = 4, 32, 2
    rng = np.random.RandomState(3)
    qp = jnp.asarray(rng.randn(b, t, h * d).astype(np.float32))
    kp = jnp.asarray(rng.randn(b, s, h * d).astype(np.float32))
    vp = jnp.asarray(rng.randn(b, s, h * d).astype(np.float32))
    e1 = jnp.asarray(rng.randn(h, s, d).astype(np.float32))
    e2 = jnp.asarray(rng.randn(h, s, d).astype(np.float32))
    mask_f = jnp.maximum(causal_mask(t).astype(jnp.float32), pa.NEG_BIG)
    seed = jnp.full((1,), 5, jnp.int32)
    interp = jax.default_backend() != "tpu"

    def f(narrow, *a):
        if narrow:
            monkeypatch.setenv("VQCPCB_RELBIAS_NARROW", "1")
            ctx = pa.relbias_causal_scope()
        else:
            monkeypatch.delenv("VQCPCB_RELBIAS_NARROW", raising=False)
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            out = pa.fused_attention_train_relbias_packed(
                0.2, interp, h, seed, a[0], a[1], a[2], mask_f, a[3], a[4])
        return (out * jnp.cos(jnp.arange(out.size).reshape(out.shape))).sum()

    args = (qp, kp, vp, e1, e2)
    loss_w, g_w = jax.value_and_grad(
        lambda *a: f(False, *a), argnums=(0, 1, 2, 3, 4))(*args)
    loss_n, g_n = jax.value_and_grad(
        lambda *a: f(True, *a), argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(np.asarray(loss_n), np.asarray(loss_w),
                               rtol=1e-6, atol=0)
    for gn, gw in zip(g_n, g_w):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(gw),
                                   rtol=1e-5, atol=2e-6)


def test_decoder_layer_engages_narrow_causal_table(monkeypatch):
    """TransformerDecoderLayer's self-attention (causal by construction,
    models/decoder.py) must enter relbias_causal_scope, so with
    VQCPCB_RELBIAS_NARROW=1 the kernels pack the narrow e1-only table;
    the cross/encoder attentions must NOT."""
    import vqcpcb_tpu.ops.pallas_attention as pa
    from vqcpcb_tpu.ops.masks import causal_mask as cmask
    from vqcpcb_tpu.ops.transformer import TransformerDecoderLayer

    monkeypatch.setenv("VQCPCB_RELBIAS_NARROW", "1")
    monkeypatch.setattr(pa, "use_pallas_attention_train", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_relbias", lambda: True)
    monkeypatch.setattr(pa, "use_pallas_packed_qkv", lambda: False)
    monkeypatch.setattr(pa, "_interpret_mode", lambda _: True)
    packed_narrow = []
    orig_pack = pa._relbias_pack_e

    def spy(e1, e2, wp, narrow=False):
        packed_narrow.append(narrow)
        return orig_pack(e1, e2, wp, narrow)

    monkeypatch.setattr(pa, "_relbias_pack_e", spy)

    layer = TransformerDecoderLayer(
        d_model=16, n_head=2,
        attention_bias_type_self="relative_attention",
        attention_bias_type_cross=None,
        num_channels_encoder=1, num_events_encoder=16,
        num_channels_decoder=4, num_events_decoder=4)
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    mem = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), tgt, mem)
    layer.apply(params, tgt, mem, tgt_mask=cmask(16), training=True,
                rngs={"dropout": jax.random.PRNGKey(1)})
    assert packed_narrow and packed_narrow[0] is True, packed_narrow
