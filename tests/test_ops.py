"""Unit tests for losses, masks, sampling and the GRU (torch-CPU as oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqcpcb_tpu.ops.gru import GRU
from vqcpcb_tpu.ops.losses import (
    categorical_crossentropy,
    distilled_categorical_crossentropy,
    nce_loss,
    quantization_loss_aggregate,
)
from vqcpcb_tpu.ops.masks import anticausal_mask, causal_mask
from vqcpcb_tpu.ops.sampling import sample_categorical, top_k_top_p_filtering


def test_nce_loss_value():
    rng = np.random.RandomState(0)
    pos = rng.randn(4, 3).astype(np.float32)
    neg = rng.randn(4, 3, 5).astype(np.float32)
    got = float(nce_loss(jnp.asarray(pos), jnp.asarray(neg)))
    stacked = np.concatenate([neg, pos[..., None]], axis=2)
    lse = np.log(np.exp(stacked).sum(axis=2))
    want = -(pos - lse).sum(1).mean(0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_quantization_loss_aggregate():
    rng = np.random.RandomState(1)
    left = rng.rand(4, 6).astype(np.float32)
    right = rng.rand(4, 6).astype(np.float32)
    neg = rng.rand(4, 15, 6, 1).astype(np.float32)
    got = float(quantization_loss_aggregate(
        jnp.asarray(left), jnp.asarray(neg), jnp.asarray(right)))
    want = np.concatenate([left.sum(1), right.sum(1), neg.sum((1, 2, 3))]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # bidirectional variant
    got2 = float(quantization_loss_aggregate(
        jnp.asarray(left), jnp.asarray(neg), jnp.asarray(right), jnp.asarray(neg)))
    want2 = np.concatenate(
        [left.sum(1), right.sum(1), neg.sum((1, 2, 3)), neg.sum((1, 2, 3))]).mean()
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_categorical_crossentropy_against_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    b, e = 3, 5
    vocabs = [7, 9, 4, 6]
    value = [rng.randn(b, e, v).astype(np.float32) for v in vocabs]
    target = np.stack([rng.randint(0, v, size=(b, e)) for v in vocabs], axis=-1)
    got = float(categorical_crossentropy(
        [jnp.asarray(v) for v in value], jnp.asarray(target)))
    # oracle: mean over positions of channel-summed CE
    want = 0.0
    for c, v in enumerate(value):
        ce = torch.nn.functional.cross_entropy(
            torch.tensor(v).reshape(-1, vocabs[c]),
            torch.tensor(target[..., c]).reshape(-1), reduction="none")
        want = want + ce.numpy()
    np.testing.assert_allclose(got, want.mean(), rtol=1e-5)


def test_distilled_crossentropy_value():
    rng = np.random.RandomState(3)
    b, e, v = 2, 6, 5
    student = [rng.randn(b, e, v).astype(np.float32) for _ in range(2)]
    teacher = [rng.randn(b, e, v).astype(np.float32) for _ in range(2)]
    mask = np.zeros((b, e, 2)); mask[:, 2, :] = 1
    got = float(distilled_categorical_crossentropy(
        [jnp.asarray(s) for s in student], [jnp.asarray(t) for t in teacher],
        jnp.asarray(mask)))

    def softmax(x):
        ex = np.exp(x - x.max(-1, keepdims=True))
        return ex / ex.sum(-1, keepdims=True)

    want = 0.0
    for s, t in zip(student, teacher):
        p = softmax(t[:, 2])
        logq = s[:, 2] - np.log(np.exp(s[:, 2] - s[:, 2].max(-1, keepdims=True)
                                       ).sum(-1, keepdims=True)) - s[:, 2].max(-1, keepdims=True)
        want = want + (-(p * logq).sum(-1))
    np.testing.assert_allclose(got, want.mean(), rtol=1e-4)


def test_masks():
    c = np.asarray(causal_mask(4))
    assert np.isneginf(c[0, 1]) and c[1, 0] == 0 and c[2, 2] == 0
    a = np.asarray(anticausal_mask(4))
    assert np.isneginf(a[1, 0]) and a[0, 1] == 0 and a[2, 2] == 0
    # rectangular cross mask: rows repeated by the subsampling factor
    r = np.asarray(anticausal_mask(4, sz_tgt=8))
    assert r.shape == (8, 4)
    np.testing.assert_array_equal(r[0], r[1])
    np.testing.assert_array_equal(r[2], np.asarray(anticausal_mask(4))[1])


def test_top_k_filtering():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    out = np.asarray(top_k_top_p_filtering(logits, top_k=2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0


def test_top_p_filtering_keeps_first_above_threshold():
    # heavily peaked: top token has prob ~0.84; top_p=0.5 keeps only it
    logits = jnp.asarray([[4.0, 2.0, 1.0, 0.0]])
    out = np.asarray(top_k_top_p_filtering(logits, top_p=0.5))
    assert out[0, 0] == 4.0
    assert np.isneginf(out[0, 1:]).all()
    # flat-ish distribution: everything kept with top_p close to 1
    logits2 = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    out2 = np.asarray(top_k_top_p_filtering(logits2, top_p=0.99))
    assert np.isfinite(out2).all()


def test_top_p_exact_ties_matches_reference_oracle():
    """PARITY.md deviation #0 closure: exact_ties=True must reproduce the
    reference's positional removal (VQCPCB/utils.py:101-128, executed as the
    oracle) bit-for-bit, INCLUDING exact float ties at the nucleus boundary
    — the one case the default value-threshold rule intentionally differs on."""
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_utils", "/root/reference/VQCPCB/utils.py")
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)

    rng = np.random.RandomState(7)
    cases = [rng.randn(12).astype(np.float32) for _ in range(8)]
    # boundary-tie constructions: duplicated logits straddling the nucleus cut
    tied = np.asarray([2.0, 1.0, 1.0, 1.0, 0.0, -1.0], dtype=np.float32)
    cases += [tied, tied[::-1].copy(),
              np.zeros(6, dtype=np.float32),
              np.asarray([3.0, 3.0, 3.0, -5.0], dtype=np.float32)]
    for top_p in (0.3, 0.5, 0.8, 0.95):
        for top_k in (0, 3):
            for logits in cases:
                ref = ref_utils.top_k_top_p_filtering(
                    torch.tensor(logits.copy()), top_k=top_k,
                    top_p=top_p).numpy()
                ours = np.asarray(top_k_top_p_filtering(
                    jnp.asarray(logits)[None], top_k=top_k, top_p=top_p,
                    exact_ties=True))[0]
                np.testing.assert_array_equal(
                    ref, ours,
                    err_msg=f"top_p={top_p} top_k={top_k} logits={logits}")


def test_top_p_default_and_exact_agree_without_ties():
    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(16, 20).astype(np.float32))
    a = np.asarray(top_k_top_p_filtering(logits, top_p=0.7, exact_ties=False))
    b = np.asarray(top_k_top_p_filtering(logits, top_p=0.7, exact_ties=True))
    np.testing.assert_array_equal(a, b)


def test_sample_categorical_respects_filter():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.tile([[5.0, 4.0, -1.0, -2.0]], (64, 1)))
    samples = np.asarray(sample_categorical(rng, logits, top_k=2))
    assert set(samples.tolist()) <= {0, 1}


def test_gru_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    b, t, inp, hid, layers = 3, 7, 5, 6, 2
    x = rng.randn(b, t, inp).astype(np.float32)

    tg = torch.nn.GRU(input_size=inp, hidden_size=hid, num_layers=layers,
                      bias=True, batch_first=True, bidirectional=False)
    jg = GRU(hidden_size=hid, num_layers=layers)
    params = jg.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # copy torch weights into the flax GRU (torch stores W as (3h, in))
    p = dict(params["params"])
    for layer in range(layers):
        w_ih = getattr(tg, f"weight_ih_l{layer}").detach().numpy()
        w_hh = getattr(tg, f"weight_hh_l{layer}").detach().numpy()
        b_ih = getattr(tg, f"bias_ih_l{layer}").detach().numpy()
        b_hh = getattr(tg, f"bias_hh_l{layer}").detach().numpy()
        p[f"layer_{layer}_w_i"] = jnp.asarray(w_ih.T)
        p[f"layer_{layer}_w_h"] = jnp.asarray(w_hh.T)
        p[f"layer_{layer}_b_i"] = jnp.asarray(b_ih)
        p[f"layer_{layer}_b_h"] = jnp.asarray(b_hh)
    got = np.asarray(jg.apply({"params": p}, jnp.asarray(x)))
    want = tg(torch.tensor(x))[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_trapezoid_schedule():
    """Warmup 10k steps 0.1x->1x, decay at a tenth of the warmup slope,
    floored at 0.1x (reference vqcpc_encoder_trainer.py:95-107)."""
    from vqcpcb_tpu.training.optim import trapezoid_schedule
    sched = trapezoid_schedule(1e-3)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10_000)), 1e-3, rtol=1e-4)
    np.testing.assert_allclose(float(sched(5_000)), 1e-3 * 0.55, rtol=1e-4)
    # decay after warmup, 10x slower
    np.testing.assert_allclose(float(sched(20_000)),
                               1e-3 * (1 - 0.9 / 10), rtol=1e-4)
    # floor
    assert abs(float(sched(10_000_000)) - 1e-4) < 1e-9


def test_trapezoid_schedule_warmup_override(monkeypatch):
    """VQCPCB_WARMUP_STEPS rescales the trapezoid for short budgets."""
    from vqcpcb_tpu.training.optim import trapezoid_schedule
    monkeypatch.setenv("VQCPCB_WARMUP_STEPS", "1000")
    sched = trapezoid_schedule(1e-3)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-4)
    np.testing.assert_allclose(float(sched(500)), 1e-3 * 0.55, rtol=1e-4)
    np.testing.assert_allclose(float(sched(2000)),
                               1e-3 * (1 - 0.9 / 10), rtol=1e-4)


def test_optimizer_clips_gradients():
    import optax
    from vqcpcb_tpu.training.optim import make_optimizer
    tx = make_optimizer(1.0)
    params = {"w": jnp.zeros(3)}
    grads = {"w": jnp.asarray([30.0, 40.0, 0.0])}  # norm 50 -> clip to 5
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # adam normalises magnitude, but the clipped grad direction survives
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_metrics_writer_jsonl(tmp_path):
    import json
    from vqcpcb_tpu.training.metrics import MetricsWriter
    w = MetricsWriter(str(tmp_path), plot=False)
    w.write(0, {"loss": 1.5, "accuracy": [0.1, 0.2]}, {"loss": 2.0})
    w.write(1, {"loss": 1.2, "accuracy": [0.3, 0.4]}, None)
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss/train"] == 1.5
    assert lines[0]["accuracy_1/train"] == 0.2
    assert lines[0]["loss/val"] == 2.0
    assert lines[1]["epoch"] == 1


def test_bigru_matches_two_unidirectional_grus():
    """BiGRU's fused direction-stacked scan equals running two independent
    GRUs (forward on x, backward on reversed x) with the same weights."""
    from vqcpcb_tpu.ops.gru import GRU, BiGRU
    rng = np.random.RandomState(9)
    b, t, inp, hid, layers = 3, 6, 5, 4, 2
    x = jnp.asarray(rng.randn(b, t, inp).astype(np.float32))

    bi = BiGRU(hidden_size=hid, num_layers=layers)
    bi_params = bi.init(jax.random.PRNGKey(0), x)["params"]
    got = np.asarray(bi.apply({"params": bi_params}, x))

    uni = GRU(hidden_size=hid, num_layers=layers)
    outs = []
    for d, xx in enumerate([x, x[:, ::-1]]):
        p = {k: v[d] for k, v in bi_params.items()}
        outs.append(np.asarray(uni.apply({"params": p}, xx))[:, -1])
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gru_projection_placement_identical(monkeypatch):
    """VQCPCB_GRU_PROJ=scan (input projection inside the scan body) computes
    the same math as the default hoisted projection — only the HBM traffic
    pattern differs (ops/gru.py:_project_in_scan)."""
    from vqcpcb_tpu.ops.gru import GRU, BiGRU
    rng = np.random.RandomState(11)
    b, t, inp, hid, layers = 3, 7, 5, 4, 2
    x = jnp.asarray(rng.randn(b, t, inp).astype(np.float32))

    for mod in (GRU(hidden_size=hid, num_layers=layers),
                BiGRU(hidden_size=hid, num_layers=layers)):
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(mod.apply(p, x) ** 2)

        monkeypatch.delenv("VQCPCB_GRU_PROJ", raising=False)
        want, gwant = jax.value_and_grad(loss)(params)
        monkeypatch.setenv("VQCPCB_GRU_PROJ", "scan")
        got, ggot = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(ggot), jax.tree.leaves(gwant)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)
