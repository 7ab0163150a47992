"""Hardening utilities: training stats, debug helpers, weights-only export."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_siren_tpu.utils.training_stats import (
    Collector, init_moments, mean, report, std,
)
from nerf_siren_tpu.utils.debug import (
    assert_all_finite, check_replica_consistency, enable_nan_debug,
)


def test_moments_roundtrip(rng):
    vals = rng.standard_normal(1000).astype(np.float32)
    m = init_moments()
    for chunk in np.split(vals, 10):
        m = report(m, jnp.asarray(chunk))
    np.testing.assert_allclose(float(mean(m)), vals.mean(), atol=1e-4)
    np.testing.assert_allclose(float(std(m)), vals.std(), atol=1e-3)


def test_collector(rng):
    c = Collector()
    vals = rng.uniform(0, 1, 500)
    for v in np.split(vals, 5):
        c.report("loss", v)
    d = c.as_dict()
    np.testing.assert_allclose(d["loss"]["mean"], vals.mean(), rtol=1e-6)
    np.testing.assert_allclose(d["loss"]["num"], 500)
    c.reset()
    assert c.as_dict() == {}


def test_replica_consistency():
    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros(8)}
    h = check_replica_consistency(params)
    # same params → same hash; perturbed params → mismatch raises
    check_replica_consistency(params, reference_hash=h)
    bad = {"w": jnp.ones((8, 8)) * 1.01, "b": jnp.zeros(8)}
    with pytest.raises(AssertionError):
        check_replica_consistency(bad, reference_hash=h)


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, np.nan])})


def test_nan_debug_toggle():
    enable_nan_debug(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        enable_nan_debug(False)


def test_save_weights_only(tmp_path):
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.training.checkpoints import (
        load_checkpoint, save_checkpoint)
    from nerf_siren_tpu.utils.save_weights_only import save_weights_only

    full = {
        "params": {"nerf_coarse": init_nerf(jax.random.PRNGKey(0))},
        "opt_state": {"momentum": np.ones(10)},
        "step": np.asarray(42),
        "epoch": np.asarray(3),
    }
    p = str(tmp_path / "full.msgpack")
    save_checkpoint(p, full)
    out = save_weights_only(p)
    stripped = load_checkpoint(out)
    assert set(stripped) == {"nerf_coarse"}
    import os
    assert os.path.getsize(out) < os.path.getsize(p)
