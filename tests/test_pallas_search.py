"""Pallas streaming-search kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dewi_tpu.ops.pallas_search import BLOCK, pallas_fused_search
from dewi_tpu.ops.similarity import fused_search, l2_normalize


def setup_arrays(cap=2048, d=64, q=3, seed=0):
    rng = np.random.default_rng(seed)
    emb = np.asarray(
        l2_normalize(jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32)))
    )
    pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
    queries = np.asarray(
        l2_normalize(jnp.asarray(rng.normal(size=(q, d)).astype(np.float32)))
    )
    return jnp.asarray(emb), jnp.asarray(pay), jnp.asarray(queries)


def run_both(emb, pay, q, n_valid, eta, ep, k, block=1024):
    sqn = jnp.sum(emb * emb, axis=1)
    s_ref, i_ref = fused_search(
        emb, sqn, pay, q, jnp.int32(n_valid),
        jnp.float32(eta), jnp.float32(ep), k=k,
    )
    s_pl, i_pl = pallas_fused_search(
        emb, pay, q, jnp.int32(n_valid),
        jnp.float32(eta), jnp.float32(ep), k=k, block=block, interpret=True,
    )
    return map(np.asarray, (s_ref, i_ref, s_pl, i_pl))


class TestPallasSearch:
    def test_matches_xla_scores_and_sets(self):
        emb, pay, q = setup_arrays()
        s_ref, i_ref, s_pl, i_pl = run_both(emb, pay, q, 2000, 0.3, 0.1, k=10)
        np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-5)
        for a, b in zip(i_ref, i_pl):
            assert set(a.tolist()) == set(b.tolist())

    def test_validity_mask(self):
        # Only the first 5 rows are live; no padding index may appear.
        emb, pay, q = setup_arrays(cap=1024, d=32, q=2)
        _, _, s_pl, i_pl = run_both(emb, pay, q, 5, 0.0, 0.0, k=5, block=256)
        assert i_pl.max() < 5

    def test_multi_block_merge(self):
        # Force many grid steps so the running-buffer merge is exercised.
        emb, pay, q = setup_arrays(cap=2048, d=32, q=2, seed=3)
        s_ref, i_ref, s_pl, i_pl = run_both(
            emb, pay, q, 2048, 0.5, 0.2, k=7, block=256
        )
        np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-5)

    def test_eta_extremes(self):
        emb, pay, q = setup_arrays(cap=1024, d=32, q=2, seed=5)
        for eta in (0.0, 1.0):
            s_ref, i_ref, s_pl, i_pl = run_both(
                emb, pay, q, 1000, eta, 0.0, k=5, block=512
            )
            np.testing.assert_allclose(s_ref, s_pl, rtol=1e-5, atol=1e-5)

    def test_capacity_must_divide(self):
        emb, pay, q = setup_arrays(cap=1024, d=32, q=1)
        with pytest.raises(AssertionError):
            pallas_fused_search(
                emb, pay, q, jnp.int32(10), jnp.float32(0.5),
                jnp.float32(0.0), k=5, block=3000, interpret=True,
            )


class TestPallasInt8:
    def test_matches_numpy_oracle(self):
        from dewi_tpu.ops.pallas_search import pallas_int8_search
        from dewi_tpu.ops.similarity import rerank_scores

        emb, pay, q = setup_arrays(cap=2048, d=64, q=3, seed=11)
        e8 = np.clip(np.round(np.asarray(emb) * 127), -127, 127).astype(np.int8)
        sc = (np.abs(np.asarray(emb)).max(axis=1) / 127.0).astype(np.float32)
        s, i = pallas_int8_search(
            jnp.asarray(e8), jnp.asarray(sc), pay, q,
            jnp.int32(2000), jnp.float32(0.3), jnp.float32(0.1),
            k=10, block=512, interpret=True,
        )
        sim = (np.asarray(q) @ e8.astype(np.float32).T) * sc[None, :]
        adj = np.array(rerank_scores(jnp.asarray(sim), pay,
                                     jnp.float32(0.3), jnp.float32(0.1)))
        adj[:, 2000:] = -np.inf
        ref = np.argsort(-adj, axis=1)[:, :10]
        for a, b in zip(np.asarray(i), ref):
            assert len(set(a.tolist()) & set(b.tolist())) >= 9  # bf16 cast slack


class TestPallasScoresMatrix:
    """Scores-only stage-1 kernel (selection stays in XLA outside)."""

    def test_matches_xla_fold_multiblock(self):
        from dewi_tpu.ops.pallas_search import pallas_scores_matrix

        rng = np.random.default_rng(21)
        cap, d, nq = 2048, 64, 3
        e8 = rng.integers(-127, 128, size=(cap, d)).astype(np.int8)
        mult = rng.uniform(0.5, 1.5, size=cap).astype(np.float32)
        add = rng.normal(size=cap).astype(np.float32)
        add[2000:] = -np.inf
        q = rng.normal(size=(nq, d)).astype(np.float32)
        got = np.asarray(pallas_scores_matrix(
            jnp.asarray(e8), jnp.asarray(mult), jnp.asarray(add),
            jnp.asarray(q), block=256, interpret=True,
        ))
        # Reference with the same bf16 operand cast the kernel applies.
        acc = np.asarray(jax.lax.dot_general(
            jnp.asarray(q).astype(jnp.bfloat16),
            jnp.asarray(e8).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        ref = acc * mult[None, :] + add[None, :]
        np.testing.assert_allclose(got[:, :2000], ref[:, :2000],
                                   rtol=1e-5, atol=1e-4)
        assert np.all(np.isneginf(got[:, 2000:]))

    def test_bf16_out_dtype(self):
        """out_dtype=bf16 writes a bf16 matrix equal to the f32 one rounded."""
        from dewi_tpu.ops.pallas_search import pallas_scores_matrix

        rng = np.random.default_rng(23)
        cap, d, nq = 1024, 64, 2
        e8 = rng.integers(-127, 128, size=(cap, d)).astype(np.int8)
        mult = rng.uniform(0.5, 1.5, size=cap).astype(np.float32)
        add = rng.normal(size=cap).astype(np.float32)
        add[1000:] = -np.inf
        q = rng.normal(size=(nq, d)).astype(np.float32)
        args = (jnp.asarray(e8), jnp.asarray(mult), jnp.asarray(add),
                jnp.asarray(q))
        f32 = pallas_scores_matrix(*args, block=256, interpret=True)
        b16 = pallas_scores_matrix(*args, block=256, interpret=True,
                                   out_dtype=jnp.bfloat16)
        assert b16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(b16[:, :1000], dtype=np.float32),
            np.asarray(f32[:, :1000].astype(jnp.bfloat16), dtype=np.float32))
        assert np.all(np.isneginf(np.asarray(b16[:, 1000:],
                                             dtype=np.float32)))

    def test_quantized_search_pallas_stage1_parity(self):
        from dewi_tpu.ops.quantized import quantize_rows, quantized_search
        from dewi_tpu.ops.pallas_search import SCORES_BLOCK

        rng = np.random.default_rng(22)
        cap, d, nq, n = SCORES_BLOCK, 32, 2, 6000
        emb = np.asarray(l2_normalize(
            jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))))
        pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        e8, sc = quantize_rows(jnp.asarray(emb))
        sqn = jnp.sum(jnp.asarray(emb) ** 2, axis=1)
        common = dict(k=10, m=80, normalize=True, approx_select=False)
        s_x, i_x = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            pallas_stage1=False, **common)
        s_p, i_p = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            pallas_stage1=True, interpret=True, **common)
        # Stage-2 refine is exact over the candidate set; bf16 stage-1
        # noise can only reorder the candidate tail.
        for a, b in zip(np.asarray(i_x), np.asarray(i_p)):
            assert len(set(a.tolist()) & set(b.tolist())) >= 9
        np.testing.assert_allclose(
            np.sort(np.asarray(s_x), axis=1)[:, -9:],
            np.sort(np.asarray(s_p), axis=1)[:, -9:], rtol=1e-4, atol=1e-4)


class TestPallasScoresMatrixS8:
    """Native s8xs8 scores kernel: integer stage-1 with folded query scale."""

    def test_matches_int_oracle_multiblock(self):
        from dewi_tpu.ops.pallas_search import pallas_scores_matrix_s8

        rng = np.random.default_rng(31)
        cap, d, nq = 2048, 64, 3
        e8 = rng.integers(-127, 128, size=(cap, d)).astype(np.int8)
        q8 = rng.integers(-127, 128, size=(nq, d)).astype(np.int8)
        qs = rng.uniform(0.01, 0.1, size=nq).astype(np.float32)
        mult = rng.uniform(0.5, 1.5, size=cap).astype(np.float32)
        add = rng.normal(size=cap).astype(np.float32)
        add[2000:] = -np.inf
        got = np.asarray(pallas_scores_matrix_s8(
            jnp.asarray(e8), jnp.asarray(mult), jnp.asarray(add),
            jnp.asarray(q8), jnp.asarray(qs), block=256, interpret=True,
        ))
        # Integer matmul is exact; only the f32 epilogue rounds.
        acc = q8.astype(np.int64) @ e8.astype(np.int64).T
        ref = (acc.astype(np.float32) * (qs[:, None] * mult[None, :])
               + add[None, :])
        np.testing.assert_allclose(got[:, :2000], ref[:, :2000],
                                   rtol=1e-5, atol=1e-5)
        assert np.all(np.isneginf(got[:, 2000:]))

    def test_bmax_kernels_match_oracle(self):
        """Fused stage-1+max kernels: [Q, cap/sub] maxima == two-pass oracle."""
        from dewi_tpu.ops.pallas_search import pallas_bmax, pallas_bmax_s8

        rng = np.random.default_rng(41)
        cap, d, nq, sub = 2048, 64, 3, 128
        e8 = rng.integers(-127, 128, size=(cap, d)).astype(np.int8)
        mult = rng.uniform(0.5, 1.5, size=cap).astype(np.float32)
        add = rng.normal(size=cap).astype(np.float32)
        add[2000:] = -np.inf
        # s8 variant: integer matmul is exact, f32 epilogue + max.
        q8 = rng.integers(-127, 128, size=(nq, d)).astype(np.int8)
        qs = rng.uniform(0.01, 0.1, size=nq).astype(np.float32)
        got = np.asarray(pallas_bmax_s8(
            jnp.asarray(e8), jnp.asarray(mult), jnp.asarray(add),
            jnp.asarray(q8), jnp.asarray(qs), sub=sub, block=512,
            interpret=True))
        acc = q8.astype(np.int64) @ e8.astype(np.int64).T
        adj = (acc.astype(np.float32) * (qs[:, None] * mult[None, :])
               + add[None, :])
        ref = adj.reshape(nq, cap // sub, sub).max(axis=-1)
        assert got.shape == (nq, cap // sub)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        # bf16-query variant (same operand cast as pallas_scores_matrix).
        q = rng.normal(size=(nq, d)).astype(np.float32)
        got_b = np.asarray(pallas_bmax(
            jnp.asarray(e8), jnp.asarray(mult), jnp.asarray(add),
            jnp.asarray(q), sub=sub, block=512, interpret=True))
        acc_b = np.asarray(jax.lax.dot_general(
            jnp.asarray(q).astype(jnp.bfloat16),
            jnp.asarray(e8).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        adj_b = acc_b * mult[None, :] + add[None, :]
        ref_b = adj_b.reshape(nq, cap // sub, sub).max(axis=-1)
        np.testing.assert_allclose(got_b, ref_b, rtol=1e-5, atol=1e-4)

    def test_quantized_search_fused_bmax_matches_two_pass(self):
        # fused_bmax routes stage 1 through the bmax kernel; selection math
        # is identical to the two-pass blockmax path, and the s8 integer
        # stage-1 is exact, so results must match bit-for-bit.
        from dewi_tpu.ops.quantized import quantize_rows, quantized_search

        rng = np.random.default_rng(42)
        cap, d, nq, n = 2048, 32, 2, 1800
        emb = np.asarray(l2_normalize(
            jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))))
        pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        e8, sc = quantize_rows(jnp.asarray(emb))
        sqn = jnp.sum(jnp.asarray(emb) ** 2, axis=1)
        for i8q in (True, False):
            common = dict(k=10, m=80, normalize=True, blockmax_select=True,
                          int8_queries=i8q)
            s_x, i_x = quantized_search(
                e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay),
                jnp.asarray(q), jnp.int32(n), jnp.float32(0.3),
                jnp.float32(0.1), pallas_stage1=False, **common)
            s_f, i_f = quantized_search(
                e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay),
                jnp.asarray(q), jnp.int32(n), jnp.float32(0.3),
                jnp.float32(0.1), pallas_stage1=True, fused_bmax=True,
                pallas_block=2048, interpret=True, **common)
            if i8q:
                np.testing.assert_array_equal(np.asarray(i_x),
                                              np.asarray(i_f))
                np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_f),
                                           rtol=1e-6, atol=1e-6)
            else:
                # bf16 operand cast noise can reorder the candidate tail.
                for a, b in zip(np.asarray(i_x), np.asarray(i_f)):
                    assert len(set(a.tolist()) & set(b.tolist())) >= 9

    def test_quantized_search_fused_bmax_large_batch(self):
        # Q > BLOCKMAX_REFINE_MAX_Q with fused_bmax: the batch chunks into
        # 32-query groups under lax.map, each re-running the small-Q fused
        # pipeline (one corpus pass per group; [Q, cap] never exists).
        # Results must EXACTLY equal running the small-Q fused path on
        # each group directly — plus a sanity overlap vs the materialized
        # path (the chunked route refines s*128 >= m candidates, so its
        # tail can only be at least as exact).
        from dewi_tpu.ops.quantized import (
            BLOCKMAX_REFINE_MAX_Q, quantize_rows, quantized_search,
        )

        rng = np.random.default_rng(7)
        cap, d, n = 2048, 32, 1900
        g = BLOCKMAX_REFINE_MAX_Q
        nq = g + 8  # exercises the padded final group too
        emb = np.asarray(l2_normalize(
            jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))))
        pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        e8, sc = quantize_rows(jnp.asarray(emb))
        sqn = jnp.sum(jnp.asarray(emb) ** 2, axis=1)
        common = dict(k=10, m=256, normalize=True, blockmax_select=True,
                      int8_queries=True)
        fused = dict(pallas_stage1=True, fused_bmax=True, pallas_block=1024,
                     interpret=True)
        s_f, i_f = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            **common, **fused)
        parts = []
        for s0 in range(0, nq, g):
            chunk = q[s0 : s0 + g]
            _, i_c = quantized_search(
                e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay),
                jnp.asarray(chunk), jnp.int32(n), jnp.float32(0.3),
                jnp.float32(0.1), **common, **fused)
            parts.append(np.asarray(i_c))
        np.testing.assert_array_equal(np.asarray(i_f),
                                      np.concatenate(parts)[:nq])
        s_x, i_x = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            pallas_stage1=False, **common)
        for a, b in zip(np.asarray(i_x), np.asarray(i_f)):
            assert len(set(a.tolist()) & set(b.tolist())) >= 8

    def test_quantized_search_s8_pallas_matches_s8_xla(self):
        # pallas_stage1 + int8_queries routes through the s8 kernel; the
        # integer stage-1 accumulation is identical to the XLA int8_queries
        # path, so the full two-stage result must match exactly.
        from dewi_tpu.ops.quantized import quantize_rows, quantized_search

        rng = np.random.default_rng(32)
        cap, d, nq, n = 2048, 32, 2, 1800
        emb = np.asarray(l2_normalize(
            jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))))
        pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        e8, sc = quantize_rows(jnp.asarray(emb))
        sqn = jnp.sum(jnp.asarray(emb) ** 2, axis=1)
        common = dict(k=10, m=80, normalize=True, approx_select=False,
                      int8_queries=True)
        s_x, i_x = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            pallas_stage1=False, **common)
        s_p, i_p = quantized_search(
            e8, sc, jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q),
            jnp.int32(n), jnp.float32(0.3), jnp.float32(0.1),
            pallas_stage1=True, pallas_block=256, interpret=True, **common)
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))
        np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p),
                                   rtol=1e-6, atol=1e-6)


class TestExactBlockmaxFused:
    """Exact-tier blockmax paths of ops/similarity.fused_search."""

    def _arrays(self, cap=2048, d=32, nq=3, seed=7):
        rng = np.random.default_rng(seed)
        emb = np.asarray(l2_normalize(
            jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))))
        pay = np.abs(rng.normal(size=(cap, 8))).astype(np.float32)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        sqn = jnp.sum(jnp.asarray(emb) ** 2, axis=1)
        return jnp.asarray(emb), sqn, jnp.asarray(pay), jnp.asarray(q)

    def test_two_pass_blockmax_is_bit_identical(self):
        """Selection over the SAME materialized scores: values must be the
        flat top-k's values exactly, for both spaces and across k."""
        emb, sqn, pay, q = self._arrays()
        for normalize in (True, False):
            for k in (1, 10, 100):
                s0, i0 = fused_search(
                    emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.3),
                    jnp.float32(0.1), k=k, normalize=normalize)
                s1, i1 = fused_search(
                    emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.3),
                    jnp.float32(0.1), k=k, normalize=normalize,
                    blockmax_select=True)
                np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
                np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    def test_fused_bmax_matches_two_pass_pallas(self):
        """fused_bmax composes the bmax kernel + bf16 block re-score: same
        bf16 stage math as the Pallas scores path, so indices must agree
        and values must match to f32 accumulation-order noise."""
        emb, sqn, pay, q = self._arrays()
        common = dict(k=10, normalize=True, interpret=True, pallas_block=256)
        s0, i0 = fused_search(
            emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.3),
            jnp.float32(0.1), pallas_scores=True, blockmax_select=True,
            **common)
        s1, i1 = fused_search(
            emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.3),
            jnp.float32(0.1), pallas_scores=True, blockmax_select=True,
            fused_bmax=True, **common)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_bmax_l2(self):
        emb, sqn, pay, q = self._arrays()
        common = dict(k=10, normalize=False, interpret=True,
                      pallas_block=256)
        s0, i0 = fused_search(
            emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.4),
            jnp.float32(0.0), blockmax_select=True, **common)
        s1, i1 = fused_search(
            emb, sqn, pay, q, jnp.int32(1900), jnp.float32(0.4),
            jnp.float32(0.0), pallas_scores=True, blockmax_select=True,
            fused_bmax=True, **common)
        # XLA f32 stage vs bf16 kernel stage: candidate tails may differ,
        # but the exact guarantee holds within each scoring precision —
        # demand >= 9/10 overlap and matching leaders.
        for a, b in zip(np.asarray(i0), np.asarray(i1)):
            assert len(set(a.tolist()) & set(b.tolist())) >= 9
            assert a[0] == b[0]

    def test_blockmax_validity_mask(self):
        """Padded rows (>= n_valid) must never surface through blockmax."""
        emb, sqn, pay, q = self._arrays()
        for fused in (False, True):
            s, i = fused_search(
                emb, sqn, pay, q, jnp.int32(300), jnp.float32(0.3),
                jnp.float32(0.1), k=10, normalize=True,
                pallas_scores=fused, blockmax_select=True, fused_bmax=fused,
                interpret=True, pallas_block=256)
            assert int(np.asarray(i).max()) < 300
            assert np.isfinite(np.asarray(s)).all()
