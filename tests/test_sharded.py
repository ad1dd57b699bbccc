"""Sharded winner search + SOM step on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from som_lvq_pak_tpu.models.fast import som_batch_step, unit_coords
from som_lvq_pak_tpu.parallel.mesh import make_mesh
from som_lvq_pak_tpu.parallel.sharded import make_sharded_som_train_step, shard_arrays


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_factorization(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_sharded_matches_single_device(mesh):
    B, N, D = 64, 16 * 8, 16
    xdim, ydim = 16, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 2
    coords = unit_coords(xdim, ydim, hexa=True)

    ref = som_batch_step(codes, xb, coords, 0.05, 3.0, gaussian=False,
                         update="sum", use_pallas=False)

    step = make_sharded_som_train_step(mesh, gaussian=False, use_pallas=False)
    cs, xs, cl, cf = shard_arrays(mesh, codes, xb, coords)
    out = step(cs, xs, cl, cf, jnp.float32(0.05), jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_gaussian(mesh):
    B, N, D = 32, 64, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32)
    coords = unit_coords(8, 8, hexa=False)
    ref = som_batch_step(codes, xb, coords, 0.02, 2.0, gaussian=True,
                         update="sum", use_pallas=False)
    step = make_sharded_som_train_step(mesh, gaussian=True, use_pallas=False)
    out = step(*shard_arrays(mesh, codes, xb, coords), jnp.float32(0.02), jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
