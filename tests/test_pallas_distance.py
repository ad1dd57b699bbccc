"""Fused dist+argmin kernel vs the XLA oracle (CPU interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin, dist_argmin_reference


@pytest.mark.parametrize("shape", [(64, 96, 5), (100, 200, 20), (256, 1024, 64)])
def test_dist_argmin_matches_reference(shape):
    B, N, D = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, D), dtype=jnp.float32) * 10
    m = jax.random.normal(k2, (N, D), dtype=jnp.float32) * 10
    val, idx = dist_argmin(x, m)
    rval, ridx = dist_argmin_reference(x, m)
    assert (np.asarray(idx) == np.asarray(ridx)).all()
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval), rtol=1e-5, atol=1e-3)


def test_tie_break_first_index():
    # duplicate codes: the lower index must win (C strict < scan)
    x = jnp.ones((8, 8), dtype=jnp.float32)
    m = jnp.tile(jnp.arange(4, dtype=jnp.float32)[:, None] % 2, (1, 8))
    m = jnp.concatenate([m, m], axis=0)  # rows 0..3 duplicated at 4..7
    _, idx = dist_argmin(x, m)
    assert (np.asarray(idx) == 1).all()  # row 1 (all ones) wins, not row 3/5/7


def test_unaligned_shapes():
    B, N, D = 7, 130, 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (B, D), dtype=jnp.float32)
    m = jax.random.normal(k2, (N, D), dtype=jnp.float32)
    val, idx = dist_argmin(x, m)
    rval, ridx = dist_argmin_reference(x, m)
    assert (np.asarray(idx) == np.asarray(ridx)).all()
    np.testing.assert_allclose(np.asarray(val), np.asarray(rval), rtol=1e-5, atol=1e-4)


def test_chunked_topk_matches_exact(ref_dir):
    """Device-chunked kNN equals the host oracle incl. the reference
    (distance asc, index desc) tie order — on real data with ties."""
    import jax.numpy as jnp

    from som_lvq_pak_tpu.data.io import read_data
    from som_lvq_pak_tpu.ops import exact
    from som_lvq_pak_tpu.ops.distance import chunked_topk

    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    X = data.points[:700]
    ref_idx, ref_val = exact.pairwise_topk(X, X, 5)
    idx, val = chunked_topk(jnp.asarray(X), jnp.asarray(X), 5, chunk=256)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(val), ref_val, rtol=1e-4, atol=1e-2)


def test_knn_correct_mask_fast_matches_parity(ref_dir):
    from som_lvq_pak_tpu.data.io import read_data
    from som_lvq_pak_tpu.models.lvq import knn_correct_mask

    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    a = knn_correct_mask(data, 5, mode="parity")
    b = knn_correct_mask(data, 5, mode="fast")
    np.testing.assert_array_equal(a, b)
