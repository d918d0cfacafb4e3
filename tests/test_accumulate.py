"""On-device metric accumulation (training/accumulate.py)."""
import jax.numpy as jnp
import numpy as np

from vqcpcb_tpu.training.accumulate import MetricAccumulator


def test_means_match_host_reference():
    rng = np.random.RandomState(0)
    steps = [{"loss": jnp.asarray(rng.randn(), jnp.float32),
              "accuracy": jnp.asarray(rng.rand(6), jnp.float32)}
             for _ in range(37)]
    acc = MetricAccumulator()
    for m in steps:
        acc.add(m)
    got = acc.means()
    want_loss = np.mean([float(m["loss"]) for m in steps])
    want_acc = np.mean([np.asarray(m["accuracy"]) for m in steps], axis=0)
    assert abs(got["loss"] - want_loss) < 1e-5
    np.testing.assert_allclose(got["accuracy"], want_acc, atol=1e-5)
    assert isinstance(got["loss"], float)
    assert isinstance(got["accuracy"], list)


def test_empty_epoch():
    assert MetricAccumulator().means() is None


def test_constant_device_buffer_count():
    """The whole point: host + device state is O(1) in steps (the round-2
    pattern pinned one device tree per step for the entire epoch)."""
    acc = MetricAccumulator()
    for i in range(500):
        acc.add({"loss": jnp.float32(i)})
    # the accumulator owns exactly one small tree, not a per-step list
    assert isinstance(acc._sums, dict) and set(acc._sums) == {"loss"}
    assert abs(acc.means()["loss"] - np.mean(np.arange(500.0))) < 1e-3
