"""searchsorted vs the numpy oracle.

Mirrors the reference's only real test suite (reference:
torchsearchsorted/test/test_searchsorted.py:9-44): parametrized batch/row
sizes, both sides, random repeats, numpy as the oracle.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from nerf_siren_tpu.ops.searchsorted import searchsorted, searchsorted_binary


def numpy_searchsorted(seq, values, side):
    B = seq.shape[0]
    return np.stack([np.searchsorted(seq[i], values[i], side=side) for i in range(B)])


@pytest.mark.parametrize("B", [1, 7, 100])
@pytest.mark.parametrize("A", [1, 33, 300])
@pytest.mark.parametrize("V", [1, 12, 120])
@pytest.mark.parametrize("side", ["left", "right"])
def test_matches_numpy(B, A, V, side, rng):
    seq = np.sort(rng.standard_normal((B, A)).astype(np.float32), axis=-1)
    values = rng.standard_normal((B, V)).astype(np.float32)
    expected = numpy_searchsorted(seq, values, side)
    got = np.asarray(searchsorted(jnp.asarray(seq), jnp.asarray(values), side))
    np.testing.assert_array_equal(got, expected)
    got_bin = np.asarray(searchsorted_binary(jnp.asarray(seq), jnp.asarray(values), side))
    np.testing.assert_array_equal(got_bin, expected)


@pytest.mark.parametrize("side", ["left", "right"])
def test_duplicates_and_bounds(side, rng):
    # exact hits on duplicated bin edges are where left/right semantics differ
    seq = np.array([[0.0, 0.0, 0.5, 0.5, 0.5, 1.0]], dtype=np.float32)
    values = np.array([[-1.0, 0.0, 0.25, 0.5, 1.0, 2.0]], dtype=np.float32)
    expected = numpy_searchsorted(seq, values, side)
    got = np.asarray(searchsorted(jnp.asarray(seq), jnp.asarray(values), side))
    np.testing.assert_array_equal(got, expected)
    got_bin = np.asarray(searchsorted_binary(jnp.asarray(seq), jnp.asarray(values), side))
    np.testing.assert_array_equal(got_bin, expected)
