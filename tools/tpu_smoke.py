"""Real-chip kernel smoke: compile + run every production Pallas kernel
at the geometries production actually uses.

CPU interpret mode does NOT enforce Mosaic's layout/alignment rules — a
kernel can pass the whole test suite and still fail to compile on
hardware (r02 shipped exactly that: the factored fused kernel died with
"cannot statically prove that index in dimension 0 is a multiple of 8"
at the 256x256-map geometry, which only rows_per_tile < 8 triggers).
Run this ON THE TPU after touching ops/pallas_*.py:

    timeout 600 python tools/tpu_smoke.py

Prints one PASS/FAIL line per (kernel, geometry); exits nonzero on any
FAIL.  Each case is also a quick numeric sanity check (finite outputs,
winner indices in range).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def case(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:
        FAILED.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[-300:]}", flush=True)


def main():
    from som_lvq_pak_tpu.ops.pallas_distance import (
        dist_argmin,
        dist_top2,
        dist_topk,
    )
    from som_lvq_pak_tpu.ops.pallas_som import (
        som_fused_train_step,
        som_neighborhood_update_idx,
        som_vmem_train_steps,
    )

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)

    # --- fused train step at the two production geometries: the bench
    # map (256x256, rows_per_tile=2 — the alignment-failure geometry)
    # and the e2e config-4 map (128x128, rows_per_tile=4)
    for noc, xdim, tag in ((65536, 256, "bench256"), (16384, 128, "e2e128")):
        codes = jax.random.normal(k1, (noc, 128), jnp.float32)
        xb = jax.random.normal(k2, (1024, 128), jnp.float32)
        _, bmu0 = dist_argmin(xb, codes)

        def run(c0, kw, _noc=noc, _xdim=xdim, _bmu0=bmu0, _xb=xb):
            c2, bmu, _ = som_fused_train_step(
                c0, _xb, _bmu0, _xb, _xdim, True, jnp.float32(0.02),
                jnp.float32(3.0), gaussian=True, tile_n=512, **kw)
            c2n = np.asarray(c2, dtype=np.float32)
            assert np.isfinite(c2n).all()
            b = np.asarray(bmu)
            assert (b >= 0).all() and (b < _noc).all()

        for label, c0, kw in (
            ("plain_f32", codes, dict(factored=False)),
            ("fact_f32", codes, dict(factored=True)),
            ("fact_dreal_f32", codes, dict(factored=True, d_real=64)),
            ("fact_dreal_bf16", codes.astype(jnp.bfloat16),
             dict(factored=True, d_real=64)),
        ):
            case(f"som_fused_train_step[{tag},{label}]",
                 lambda c0=c0, kw=kw: run(c0, kw))

    # --- dual-parity factored path: one grid row per tile (tile_n ==
    # xdim on a hexa map) at the B=2048 bench geometry
    def dual_parity():
        codes = jax.random.normal(k1, (65536, 128), jnp.float32)
        xb = jax.random.normal(k2, (2048, 128), jnp.float32)
        _, bmu0 = dist_argmin(xb, codes)
        c2, bmu, _ = som_fused_train_step(
            codes, xb, bmu0, xb, 256, True, jnp.float32(0.02),
            jnp.float32(3.0), gaussian=True, tile_n=256, factored=True,
            d_real=64)
        assert np.isfinite(np.asarray(c2, dtype=np.float32)).all()
        b = np.asarray(bmu)
        assert (b >= 0).all() and (b < 65536).all()

    case("som_fused_train_step[dual_parity,B2048,tile256]", dual_parity)

    # --- batch-chunked / staggered factored kernel: the large-B (4096/
    # 8192) geometries whose (TN, B) blocks exceed scoped VMEM without
    # chunking, plus the stagger drain-cell path and the bf16 x-pattern
    def chunked(B, tile_n, bc, stag, bf16, bbf16=False):
        codes = jax.random.normal(k1, (65536, 128), jnp.float32)
        xb = jax.random.normal(k2, (B, 128), jnp.float32)
        _, bmu0 = dist_argmin(xb, codes)
        c2, bmu, _ = som_fused_train_step(
            codes, xb, bmu0, xb, 256, True, jnp.float32(0.02),
            jnp.float32(3.0), gaussian=True, tile_n=tile_n, factored=True,
            d_real=64, batch_chunk=bc, stagger=stag, wxa_bf16=bf16,
            batch_bf16=bbf16)
        assert np.isfinite(np.asarray(c2, dtype=np.float32)).all()
        b = np.asarray(bmu)
        assert (b >= 0).all() and (b < 65536).all()

    case("som_fused_chunked[B2048,tile256,bc2048,stagger]",
         lambda: chunked(2048, 256, 2048, True, False))
    case("som_fused_chunked[B4096,tile256,bc1024]",
         lambda: chunked(4096, 256, 1024, False, True))
    case("som_fused_chunked[B4096,tile256,bc1024,stagger]",
         lambda: chunked(4096, 256, 1024, True, True))
    case("som_fused_chunked[B4096,tile512,bc1024,stagger]",
         lambda: chunked(4096, 512, 1024, True, True))
    case("som_fused_chunked[B8192,tile256,bc1024,stagger,bf16]",
         lambda: chunked(8192, 256, 1024, True, True, True))
    case("som_fused_chunked[B8192,tile512,bc1024,stagger,bf16]",
         lambda: chunked(8192, 512, 1024, True, True, True))
    case("som_fused_chunked[B8192,tile256,bc1024,bf16]",
         lambda: chunked(8192, 256, 1024, False, True, True))
    case("som_fused_chunked[B4096,tile256,bc1024,noStag]",
         lambda: chunked(4096, 256, 1024, False, True))

    # --- mixed-mesh pass kernels: accumulate (no codebook I/O) and
    # blend+winner, at the production geometry
    def mixed_passes():
        from som_lvq_pak_tpu.ops.pallas_som import (
            som_blend_winner,
            som_neighborhood_accumulate,
        )

        codes = jax.random.normal(k1, (65536, 128), jnp.float32)
        xb = jax.random.normal(k2, (1024, 128), jnp.float32)
        _, bmu0 = dist_argmin(xb, codes)
        acc, wsum = som_neighborhood_accumulate(
            xb, bmu0, 65536, 256, True, jnp.float32(0.02),
            jnp.float32(3.0), gaussian=True, tile_n=512)
        c2, val, idx = som_blend_winner(codes, acc, wsum, xb,
                                        tile_n=512, d_real=64)
        assert np.isfinite(np.asarray(c2)).all()
        assert (np.asarray(idx) >= 0).all()

    case("mixed_passes[accumulate+blend_winner,65536]", mixed_passes)

    # --- fused TP step (shard_map + pallas with a traced unit offset)
    def fused_tp():
        from jax.sharding import NamedSharding, PartitionSpec as P

        from som_lvq_pak_tpu.parallel.mesh import make_mesh
        from som_lvq_pak_tpu.parallel.sharded import (
            make_sharded_fused_som_train_step,
        )

        codes = jax.random.normal(k1, (65536, 128), jnp.float32)
        xb = jax.random.normal(k2, (1024, 128), jnp.float32)
        _, bmu0 = dist_argmin(xb, codes)
        mesh = make_mesh(1, data=1, model=1)
        step = make_sharded_fused_som_train_step(
            mesh, gaussian=True, xdim=256, hexa=True, tile_n=512, d_real=64)
        cs = jax.device_put(codes, NamedSharding(mesh, P("model", None)))
        c, bm = step(cs, xb, bmu0, xb, jnp.float32(0.02), jnp.float32(3.0))
        assert np.isfinite(np.asarray(c)).all()

    case("sharded_fused_tp[65536,1-device-mesh]", fused_tp)

    # --- VMEM multi-step kernel at the trainer's auto geometry
    def vmem():
        noc, B, K = 4096, 512, 8
        codes = jax.random.normal(k1, (noc, 128), jnp.float32)
        batches = jax.random.normal(k2, (K, B, 128), jnp.float32)
        _, bmu0 = dist_argmin(batches[0], codes)
        c2, bmu = som_vmem_train_steps(
            codes, batches, bmu0, jnp.full((K,), 0.02), jnp.full((K,), 3.0),
            64, True, gaussian=True, row_chunk=512)
        assert np.isfinite(np.asarray(c2)).all()

    case("som_vmem_train_steps[4096x128]", vmem)

    # --- two-kernel step pieces: big-map dist+argmin tilings, masked
    # neighborhood update, top-2 and top-k epilogues
    codes = jax.random.normal(k1, (65536, 128), jnp.float32)
    xb = jax.random.normal(k2, (1024, 128), jnp.float32)

    def dist(tb, tn):
        v, i = dist_argmin(xb, codes, tile_b=tb, tile_n=tn)
        assert (np.asarray(i) < 65536).all()

    case("dist_argmin[256,512]", lambda: dist(256, 512))
    case("dist_argmin[512,1024]", lambda: dist(512, 1024))

    def dist_t(tb, tn):
        from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin_t

        v, i = dist_argmin_t(xb, codes, tile_b=tb, tile_n=tn)
        _, i0 = dist_argmin(xb, codes, tile_b=256, tile_n=512)
        assert (np.asarray(i) == np.asarray(i0)).mean() > 0.999

    case("dist_argmin_t[1024,512]", lambda: dist_t(1024, 512))
    case("dist_argmin_t[2048,256]", lambda: dist_t(2048, 256))

    def upd_masked():
        mask = (jax.random.uniform(k3, (1024, 128)) < 0.1).astype(jnp.uint8)
        _, bmu = dist_argmin(xb, codes)
        out = som_neighborhood_update_idx(
            codes, xb, bmu, 256, True, jnp.float32(0.05), jnp.float32(3.0),
            gaussian=True, mask=mask)
        assert np.isfinite(np.asarray(out)).all()

    case("som_neighborhood_update_idx[masked]", upd_masked)

    def top2():
        d1, i1, d2, i2 = dist_top2(xb, codes)
        assert (np.asarray(i1) != np.asarray(i2)).all()

    case("dist_top2", top2)

    def topk():
        v, i = dist_topk(xb[:256], codes, 5)
        assert np.asarray(i).shape == (256, 5)

    case("dist_topk[k=5]", topk)

    # --- olvq1 batched step (pallas path)
    def olvq1():
        from som_lvq_pak_tpu.models.fast import olvq1_batch_step

        clab = jax.random.randint(k1, (65536,), 1, 21)
        xlab = jax.random.randint(k2, (1024,), 1, 21)
        alphas = jnp.full((65536,), 0.3, jnp.float32)
        c2, a2, m2 = olvq1_batch_step(codes, clab, alphas, xb, xlab,
                                      m2=jnp.sum(codes * codes, axis=-1))
        assert np.isfinite(np.asarray(c2)).all()

    case("olvq1_batch_step[65536]", olvq1)

    print(("SMOKE FAILED: " + ", ".join(FAILED)) if FAILED else "SMOKE OK",
          flush=True)
    return 1 if FAILED else 0


if __name__ == "__main__":
    raise SystemExit(main())
