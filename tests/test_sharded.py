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


def test_sharded_olvq1_matches_batch_step(mesh):
    from som_lvq_pak_tpu.models.fast import olvq1_batch_step
    from som_lvq_pak_tpu.parallel.sharded import make_sharded_olvq1_train_step

    B, N, D = 64, 16 * 8, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 2
    clabels = jax.random.randint(k3, (N,), 1, 5)
    xlabels = jax.random.randint(k4, (B,), 1, 5)
    alphas = jnp.full((N,), 0.3, dtype=jnp.float32)

    ref_codes, ref_a = olvq1_batch_step(codes, clabels, alphas, xb, xlabels,
                                        use_pallas=False)
    step = make_sharded_olvq1_train_step(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cs = jax.device_put(codes, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
    xl = jax.device_put(xlabels, NamedSharding(mesh, P("data")))
    out_codes, out_a = step(cs, clabels, alphas, xs, xl)
    np.testing.assert_allclose(np.asarray(out_codes), np.asarray(ref_codes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               rtol=1e-6, atol=1e-6)


def test_dim_sharded_winner_search(mesh):
    from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin_reference
    from som_lvq_pak_tpu.parallel.sharded import make_dim_sharded_winner

    B, N, D = 32, 64, 32  # D divides the 4-wide model axis
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 3
    _, ref_idx = dist_argmin_reference(xb, codes)

    winner = make_dim_sharded_winner(mesh)
    val, idx = winner(xb, codes)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_class_blocked_olvq1_matches_unsharded(mesh):
    """EP layout: class-blocked sharded olvq1 == plain batch step modulo
    the row permutation, and each class's rows span a minimal shard set."""
    from som_lvq_pak_tpu.models.fast import olvq1_batch_step
    from som_lvq_pak_tpu.parallel.sharded import ClassBlockedOLVQ1

    B, N, D = 64, 16 * 8, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(21), 4)
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 2
    clabels = jax.random.randint(k3, (N,), 1, 5)
    xlabels = jax.random.randint(k4, (B,), 1, 5)
    alphas = jnp.full((N,), 0.3, dtype=jnp.float32)

    ref_codes, ref_a = olvq1_batch_step(codes, clabels, alphas, xb, xlabels,
                                        use_pallas=False)
    ep = ClassBlockedOLVQ1(mesh, codes, clabels, use_pallas=False)
    ep.step(xb, xlabels)
    np.testing.assert_allclose(np.asarray(ep.codes()), np.asarray(ref_codes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep.alphas()), np.asarray(ref_a),
                               rtol=1e-6, atol=1e-6)

    # layout property: a class with k rows can span at most
    # ceil(k / rows_per_shard) + 1 shards when blocked (vs up to S when
    # scattered); verify the blocked bound holds for every class
    s = mesh.shape["model"]
    per = -(-N // s)
    counts = {int(c): int((np.asarray(clabels) == c).sum())
              for c in np.unique(np.asarray(clabels))}
    for c, nsh in ep.shards_per_class().items():
        assert nsh <= -(-counts[c] // per) + 1, (c, nsh, counts[c])


def test_overlap_chunked_step_matches_unchunked(mesh):
    """Collective/compute-pipelined step (batch split so each chunk's
    winner all_gather overlaps the next chunk's matmul) == plain step."""
    B, N, D = 64, 16 * 8, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 2
    coords = unit_coords(16, 8, hexa=True)

    plain = make_sharded_som_train_step(mesh, gaussian=True, use_pallas=False)
    lapped = make_sharded_som_train_step(mesh, gaussian=True, use_pallas=False,
                                         overlap_chunks=4)
    args = shard_arrays(mesh, codes, xb, coords)
    a = plain(*args, jnp.float32(0.05), jnp.float32(3.0))
    b = lapped(*args, jnp.float32(0.05), jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_ring_winner_search_matches_reference(mesh):
    """Ring-pass winner search (codebook shards circulating via ppermute,
    batch never replicated) == the single-device exact argmin, including
    first-index tie-breaks on duplicated codes."""
    from som_lvq_pak_tpu.parallel.sharded import make_ring_winner

    B, N, D = 64, 16 * 8, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    # duplicate a few rows to force exact distance ties
    codes = codes.at[100].set(codes[3]).at[77].set(codes[5])
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 2

    from som_lvq_pak_tpu.ops.distance import find_winners

    ref_idx, ref_val = find_winners(xb, codes)
    winner = make_ring_winner(mesh)
    val, idx = winner(xb, codes)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-5, atol=1e-4)


def test_dim_sharded_winner_search_large_codebook(mesh):
    """SP path at the BASELINE 65k-codebook scale: the tiled scan must
    run within memory (never materializing (B, 65536)) and agree with
    the exact argmin."""
    from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin_reference
    from som_lvq_pak_tpu.parallel.sharded import make_dim_sharded_winner

    B, N, D = 16, 65536, 32
    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 3
    _, ref_idx = dist_argmin_reference(xb, codes)

    winner = make_dim_sharded_winner(mesh, chunk=2048)
    _, idx = winner(xb, codes)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sharded_fused_step_matches_single_device():
    """The fused TP step (one pass per codebook shard + allgather-min
    winner) must reproduce the single-device fused kernel: codes to
    float tolerance and winner indices exactly, over several chained
    steps."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
    from som_lvq_pak_tpu.ops.pallas_som import som_fused_train_step
    from som_lvq_pak_tpu.parallel.sharded import (
        make_sharded_fused_som_train_step,
    )

    mesh = make_mesh(8, data=1, model=8)
    noc, D, B, xdim = 128, 128, 32, 16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    codes = jax.random.normal(k1, (noc, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32)
    xn = jax.random.normal(k3, (B, D), dtype=jnp.float32)
    _, bmu0 = dist_argmin(xb, codes, tile_b=32, tile_n=64)

    step = make_sharded_fused_som_train_step(
        mesh, gaussian=True, xdim=xdim, hexa=True, tile_n=16)
    cs = jax.device_put(codes, NamedSharding(mesh, P("model", None)))
    c_sh, bm_sh = cs, bmu0
    c_ref, bm_ref = codes, bmu0
    for t in range(3):
        a = jnp.float32(0.05 - 0.01 * t)
        r = jnp.float32(3.0 - 0.5 * t)
        c_sh, bm_sh = step(c_sh, xb, bm_sh, xn, a, r)
        c_ref, bm_ref, _ = som_fused_train_step(
            c_ref, xb, bm_ref, xn, xdim, True, a, r,
            gaussian=True, tile_n=16, factored=False)
        # alternate the batches so the pipeline advances both ways
        xb, xn = xn, xb
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bm_sh), np.asarray(bm_ref))


def test_sharded_fused_step_rejects_data_parallel_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.parallel.sharded import (
        make_sharded_fused_som_train_step,
    )

    mesh = make_mesh(8, data=2, model=4)
    with pytest.raises(ValueError, match="data-axis size 1"):
        make_sharded_fused_som_train_step(mesh, gaussian=True, xdim=8,
                                          hexa=True)


@pytest.mark.parametrize("algorithm", ["lvq1", "lvq2", "lvq3"])
def test_sharded_lvq_step_matches_batch_step(mesh, algorithm):
    """Sharded fixed-alpha LVQ steps equal the single-device batched
    steps (models.fast.lvq1_batch_step / lvq23_batch_step)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.models.fast import lvq1_batch_step, lvq23_batch_step
    from som_lvq_pak_tpu.parallel.sharded import make_sharded_lvq_train_step

    B, N, D = 64, 16 * 8, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(21), 4)
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    clab = jax.random.randint(k2, (N,), 1, 5)
    xb = jax.random.normal(k3, (B, D), dtype=jnp.float32) * 2
    xlab = jax.random.randint(k4, (B,), 1, 5)
    alpha = jnp.float32(0.05)

    if algorithm == "lvq1":
        ref = lvq1_batch_step(codes, clab, xb, xlab, alpha, use_pallas=False)
    else:
        ref = lvq23_batch_step(codes, clab, xb, xlab, alpha, 0.3,
                               epsilon=0.1, lvq3=(algorithm == "lvq3"),
                               use_pallas=False)

    step = make_sharded_lvq_train_step(mesh, algorithm=algorithm,
                                       winlen=0.3, epsilon=0.1)
    out = step(
        jax.device_put(codes, NamedSharding(mesh, P("model", None))),
        clab,
        jax.device_put(xb, NamedSharding(mesh, P("data", None))),
        jax.device_put(xlab, NamedSharding(mesh, P("data"))),
        alpha,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dd,dm", [(2, 4), (1, 8), (8, 1)])
def test_mixed_fused_step_matches_oracle(dd, dm):
    """The mixed data x model fused step (accumulate -> psum -> blend ->
    winner allgather-min) equals the single-device batch update and the
    two-kernel winner sequence, across every 8-device mesh factorization
    (pure-DP 8x1, pure-TP 1x8, and mixed 2x4 — VERDICT r4 task 6),
    gaussian and bubble, scalar and per-sample alpha."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.models.fast import grid_sq_dists_idx
    from som_lvq_pak_tpu.parallel.sharded import (
        make_mixed_fused_som_train_step,
    )

    mesh = make_mesh(8, data=dd, model=dm)
    B, D = 64, 128
    xdim, ydim = 16, 8
    N = xdim * ydim
    for gaussian, per_sample in ((True, False), (False, False), (True, True)):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11 + gaussian), 3)
        codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
        xb = jax.random.normal(k2, (B, D), dtype=jnp.float32)
        xn = jax.random.normal(k3, (B, D), dtype=jnp.float32)
        bmu = jnp.argmin(
            jnp.sum((xb[:, None, :] - codes[None]) ** 2, axis=-1), axis=-1
        ).astype(jnp.int32)
        alpha = (jnp.linspace(0.01, 0.08, B).astype(jnp.float32)
                 if per_sample else jnp.float32(0.05))

        # oracle: exact-grid W update + winner on the updated codes
        d2 = grid_sq_dists_idx(bmu, N, xdim, True)
        a = jnp.broadcast_to(alpha, (B,))[:, None]
        if gaussian:
            W = a * jnp.exp(-d2 / (2.0 * 9.0))
        else:
            W = jnp.where(d2 <= 9.0, a, 0.0)
        acc = W.T @ xb
        wsum = jnp.sum(W, axis=0)[:, None]
        safe = jnp.maximum(wsum, 1e-30)
        ref = codes + jnp.minimum(wsum, 1.0) * (acc / safe - codes)
        dn = jnp.sum((xn[:, None, :] - ref[None]) ** 2, axis=-1)
        bmu_ref = jnp.argmin(dn, axis=-1)

        step = make_mixed_fused_som_train_step(
            mesh, gaussian=gaussian, xdim=xdim, hexa=True,
            tile_n=16, use_pallas=False)
        cs = jax.device_put(codes, NamedSharding(mesh, P("model", None)))
        xs = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
        bs = jax.device_put(bmu, NamedSharding(mesh, P("data")))
        ns = jax.device_put(xn, NamedSharding(mesh, P("data", None)))
        c2, bmu2 = step(cs, xs, bs, ns, alpha, jnp.float32(3.0))
        np.testing.assert_allclose(np.asarray(c2), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(bmu2), np.asarray(bmu_ref))


def test_mixed_fused_step_non_dividing_shard_height(mesh):
    """Shard heights that are multiples of 8 but not of the default
    tile (e.g. 1040 per shard) must train, not raise — the step picks a
    tile that divides the height (r4 review finding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.parallel.sharded import (
        make_mixed_fused_som_train_step,
    )

    xdim, ydim = 16, 130          # noc = 2080 -> 1040 rows per model shard
    N, B, D = xdim * ydim, 32, 128
    sub = jax.sharding.Mesh(mesh.devices.reshape(2, 2, 2)[:, :, 0],
                            ("data", "model"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32)
    bmu = jnp.argmin(
        jnp.sum((xb[:, None, :16] - codes[None, :, :16]) ** 2, axis=-1),
        axis=-1).astype(jnp.int32)
    step = make_mixed_fused_som_train_step(
        sub, gaussian=True, xdim=xdim, hexa=True, tile_n=512,
        use_pallas=False)
    c2, bmu2 = step(
        jax.device_put(codes, NamedSharding(sub, P("model", None))),
        jax.device_put(xb, NamedSharding(sub, P("data", None))),
        jax.device_put(bmu, NamedSharding(sub, P("data"))),
        jax.device_put(xb, NamedSharding(sub, P("data", None))),
        jnp.float32(0.05), jnp.float32(3.0))
    assert np.isfinite(np.asarray(c2)).all()
    assert (np.asarray(bmu2) >= 0).all() and (np.asarray(bmu2) < N).all()


def test_mixed_fused_step_overlap_segments_exact():
    """overlap_segments > 1 (segmented accumulate -> psum so XLA can
    hide each segment's data-axis collective under the next segment's
    accumulate — the SCALING.md mixed-layout lever) must be EXACTLY
    equal to the unsegmented step: row-disjoint accumulators preserve
    every per-element addition."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.parallel.sharded import (
        make_mixed_fused_som_train_step,
    )

    mesh = make_mesh(8, data=2, model=4)
    xdim, ydim = 16, 16
    N, B, D = xdim * ydim, 64, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32)
    xn = jax.random.normal(k3, (B, D), dtype=jnp.float32)
    bmu = jnp.argmin(
        jnp.sum((xb[:, None, :] - codes[None]) ** 2, axis=-1), axis=-1
    ).astype(jnp.int32)
    args = (jax.device_put(codes, NamedSharding(mesh, P("model", None))),
            jax.device_put(xb, NamedSharding(mesh, P("data", None))),
            jax.device_put(bmu, NamedSharding(mesh, P("data"))),
            jax.device_put(xn, NamedSharding(mesh, P("data", None))),
            jnp.float32(0.05), jnp.float32(3.0))
    base = make_mixed_fused_som_train_step(
        mesh, gaussian=True, xdim=xdim, hexa=True, tile_n=16,
        use_pallas=False)
    c0, b0 = base(*args)
    for segs in (2, 4):
        lapped = make_mixed_fused_som_train_step(
            mesh, gaussian=True, xdim=xdim, hexa=True, tile_n=16,
            use_pallas=False, overlap_segments=segs)
        c1, b1 = lapped(*args)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b0))


@pytest.mark.parametrize("dd,dm", [(2, 4), (1, 8)])
def test_mesh_trainer_weighted_fixed_masked_matches_single(dd, dm):
    """SOMTrainer on a mesh must equal the single-device trainer for
    data carrying weight= / fixed= tokens (which ride the fused
    mixed/TP mesh path via the effective-alpha fold and the BMU
    override) AND for masked data (which the trainer routes to the
    masked sharded two-pass step) — VERDICT r4 task 6."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.trainer import SOMTrainer

    rng = np.random.default_rng(5)
    N_DATA, D = 256, 16
    xdim, ydim = 16, 8
    X = rng.normal(0, 1, size=(N_DATA, D)).astype(np.float32)
    weight = rng.integers(0, 4, size=N_DATA).astype(np.float32)  # 0=absent
    fixed = np.full((N_DATA, 2), -1, np.int32)
    fixed[::7] = [3, 2]  # every 7th sample pinned to unit (3, 2)
    codes0 = Dataset(
        points=rng.normal(0, 1, size=(xdim * ydim, D)).astype(np.float32),
        topol=Topology.HEXA, neigh=Neighborhood.GAUSSIAN,
        xdim=xdim, ydim=ydim)

    def run(mesh, ds):
        # use_pallas=True engages the fused mixed/TP mesh paths (pallas
        # interpret mode on the CPU backend), matching what a real-chip
        # mesh run would select
        tr = SOMTrainer(codes0, batch_size=64, mesh=mesh, use_pallas=True,
                        seed=3)
        return tr.fit(ds, rlen=256, alpha=0.05, radius=4.0,
                      use_weights=True, use_fixed=True).points

    mesh = make_mesh(8, data=dd, model=dm)
    ds_wf = Dataset(points=X, weight=weight, fixed=fixed)
    np.testing.assert_allclose(
        run(mesh, ds_wf), run(None, ds_wf), rtol=1e-4, atol=1e-4)

    mask = np.zeros((N_DATA, D), np.uint8)
    mask[::5, 3] = 1
    ds_mask = Dataset(points=X, mask=mask)
    np.testing.assert_allclose(
        run(mesh, ds_mask), run(None, ds_mask), rtol=1e-4, atol=1e-4)
