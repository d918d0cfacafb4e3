"""Product VQ: indices, STE gradients, commitment loss, data-dependent init."""
import numpy as np
import jax
import jax.numpy as jnp

from vqcpcb_tpu.ops.quantizer import (
    NoQuantization,
    ProductVectorQuantizer,
    initialize_codebooks,
)


def make_quantizer(**kw):
    defaults = dict(codebook_size=8, codebook_dim=4, commitment_cost=0.25,
                    num_codebooks=1, use_batch_norm=False, squared_l2_norm=True)
    defaults.update(kw)
    return ProductVectorQuantizer(**defaults)


def test_nearest_neighbour_indices():
    q = make_quantizer()
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 4)))
    codebooks = np.asarray(params["params"]["codebooks"])  # (1, 8, 4)
    x = np.random.RandomState(0).randn(2, 3, 4).astype(np.float32)
    _, idx, _ = q.apply(params, jnp.asarray(x))
    # brute-force nearest neighbour
    want = ((x[..., None, :] - codebooks[0][None, None]) ** 2).sum(-1).argmin(-1)
    np.testing.assert_array_equal(np.asarray(idx)[..., 0], want)


def test_product_codebooks_split_features():
    q = make_quantizer(num_codebooks=2, codebook_dim=4)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4)))
    codebooks = np.asarray(params["params"]["codebooks"])  # (2, 8, 2)
    x = np.random.RandomState(1).randn(1, 2, 4).astype(np.float32)
    quantized, idx, _ = q.apply(params, jnp.asarray(x))
    assert idx.shape == (1, 2, 2)
    # quantized vector = concat of chosen sub-codewords
    for b in range(1):
        for t in range(2):
            want = np.concatenate([codebooks[k, idx[b, t, k]] for k in range(2)])
            np.testing.assert_allclose(np.asarray(quantized)[b, t], want, rtol=1e-5)


def test_straight_through_gradient():
    q = make_quantizer(commitment_cost=0.0)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4)))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 4).astype(np.float32))

    def downstream(x):
        quantized, _, _ = q.apply(params, x)
        return (quantized * jnp.arange(1.0, 5.0)).sum()

    g = jax.grad(downstream)(x)
    # STE: gradient wrt inputs of any downstream fn of quantized_sg is identity
    np.testing.assert_allclose(np.asarray(g)[0, 0], np.arange(1.0, 5.0), rtol=1e-6)


def test_commitment_loss_value_and_grads():
    q = make_quantizer(commitment_cost=0.25)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4)))
    codebooks = np.asarray(params["params"]["codebooks"])
    x = np.random.RandomState(3).randn(1, 1, 4).astype(np.float32)
    _, idx, loss = q.apply(params, jnp.asarray(x))
    chosen = codebooks[0, int(idx[0, 0, 0])]
    want = (1 + 0.25) * ((chosen - x[0, 0]) ** 2).sum()
    np.testing.assert_allclose(float(loss[0, 0]), want, rtol=1e-5)

    # e-latent term pulls inputs toward codewords; q-latent term moves codebook
    def loss_fn(params, x):
        _, _, l = q.apply(params, x)
        return l.sum()
    gp = jax.grad(loss_fn)(params, jnp.asarray(x))
    gx = jax.grad(loss_fn, argnums=1)(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx)[0, 0],
                               0.25 * 2 * (x[0, 0] - chosen), rtol=1e-5)
    grow = np.asarray(gp["params"]["codebooks"])[0, int(idx[0, 0, 0])]
    np.testing.assert_allclose(grow, 2 * (chosen - x[0, 0]), rtol=1e-5)


def test_l2_norm_variant_runs():
    q = make_quantizer(squared_l2_norm=False)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((2, 2, 4)))
    _, _, loss = q.apply(params, jnp.ones((2, 2, 4)))
    assert np.all(np.isfinite(np.asarray(loss)))


def test_initialize_codebooks_rows_come_from_input():
    rng = jax.random.PRNGKey(0)
    flat = jnp.asarray(np.random.RandomState(0).randn(32, 4).astype(np.float32))
    cb = initialize_codebooks(rng, flat, num_codebooks=2, codebook_size=8)
    assert cb.shape == (2, 8, 2)
    # every codeword row equals some input row's matching feature slice
    flat_np = np.asarray(flat)
    for k in range(2):
        sl = flat_np[:, k * 2:(k + 1) * 2]
        for row in np.asarray(cb[k]):
            assert any(np.allclose(row, r) for r in sl)


def test_corrupt_labels_changes_some_indices():
    q = make_quantizer(codebook_size=16)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((4, 64, 4)))
    x = jnp.asarray(np.random.RandomState(5).randn(4, 64, 4).astype(np.float32))
    _, idx_clean, _ = q.apply(params, x)
    _, idx_corrupt, _ = q.apply(
        params, x, training=True, corrupt_labels=True,
        rngs={"corrupt": jax.random.PRNGKey(1),
              "corrupt_mask": jax.random.PRNGKey(2)})
    frac = float(np.mean(np.asarray(idx_clean) != np.asarray(idx_corrupt)))
    assert 0.0 < frac < 0.15  # ~5% corruption rate


def test_no_quantization_passthrough():
    q = NoQuantization(codebook_dim=4)
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, 4)))
    x = jnp.ones((2, 3, 4))
    out, idx, loss = q.apply(params, x)
    assert idx is None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(loss), np.zeros((2, 3)))


def test_batch_norm_variant():
    """BatchNorm affects only the NN search; STE/loss use raw inputs.
    Running stats update when training."""
    q = make_quantizer(use_batch_norm=True)
    x = jnp.asarray(np.random.RandomState(7).randn(4, 16, 4).astype(np.float32))
    variables = q.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    (out, idx, loss), new_vars = q.apply(
        variables, x, training=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(loss)).all()
    # STE passthrough still based on raw inputs
    g = jax.grad(lambda xx: q.apply(variables, xx, training=False)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)),
                               rtol=1e-6)
    # running stats moved
    before = np.asarray(variables["batch_stats"]["batch_norm"]["mean"])
    after = np.asarray(new_vars["batch_stats"]["batch_norm"]["mean"])
    assert not np.allclose(before, after)


def test_ema_quantizer_unit():
    from vqcpcb_tpu.ops.quantizer import EMAProductVectorQuantizer
    q = EMAProductVectorQuantizer(codebook_size=4, codebook_dim=4,
                                  commitment_cost=0.25, num_codebooks=2)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 8, 4).astype(np.float32))
    variables = q.init({"params": jax.random.PRNGKey(0)}, x)
    (out, idx, loss), new_vars = q.apply(
        variables, x, training=True, mutable=["ema"])
    assert idx.shape == (2, 8, 2)
    assert np.isfinite(np.asarray(loss)).all()
    # codebooks moved toward data without gradients
    b = np.asarray(variables["ema"]["codebooks"])
    a = np.asarray(new_vars["ema"]["codebooks"])
    assert not np.allclose(a, b)
    # eval does not mutate
    out2 = q.apply(variables, x, training=False)
    assert len(out2) == 3


def test_ema_init_invariant_preserves_unhit_codes():
    """ema_sums == codebooks * cluster_size at init: a code never selected in
    the first batch must stay ~at its initialization (decayed toward itself),
    not collapse to the origin."""
    from vqcpcb_tpu.ops.quantizer import EMAProductVectorQuantizer

    q = EMAProductVectorQuantizer(codebook_size=8, codebook_dim=2,
                                  commitment_cost=0.25, num_codebooks=1,
                                  ema_decay=0.9)
    # inputs pinned near one point -> at most a couple of codes get hits
    x = jnp.asarray(100.0 + 0.01 * np.random.RandomState(0).randn(4, 6, 2),
                    jnp.float32)
    variables = q.init({"params": jax.random.PRNGKey(0)}, x)
    np.testing.assert_allclose(
        np.asarray(variables["ema"]["ema_sums"]),
        np.asarray(variables["ema"]["codebooks"])
        * np.asarray(variables["ema"]["cluster_size"])[..., None])
    (_, idx, _), new_vars = q.apply(variables, x, training=True,
                                    mutable=["ema"])
    hit = np.zeros(8, bool)
    hit[np.asarray(idx).ravel()] = True
    before = np.asarray(variables["ema"]["codebooks"])[0]
    after = np.asarray(new_vars["ema"]["codebooks"])[0]
    for code in np.nonzero(~hit)[0]:
        assert np.linalg.norm(after[code]) > 0.1, code   # not wiped to origin
        np.testing.assert_allclose(after[code], before[code], rtol=0.2)


def test_ema_quantizer_rejects_corrupt_labels():
    from vqcpcb_tpu.ops.quantizer import EMAProductVectorQuantizer
    import pytest

    q = EMAProductVectorQuantizer(codebook_size=4, codebook_dim=2,
                                  commitment_cost=0.25, num_codebooks=1)
    x = jnp.zeros((2, 3, 2), jnp.float32)
    variables = q.init({"params": jax.random.PRNGKey(0)}, x)
    with pytest.raises(NotImplementedError):
        q.apply(variables, x, training=True, corrupt_labels=True,
                mutable=["ema"])
