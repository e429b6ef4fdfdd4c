"""Native C++ runtime vs numpy-fallback equivalence tests."""

import numpy as np
import pytest

from graph_neural_pde_tpu import runtime


def random_graph(n=200, e=800, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, n, e).astype(np.int32),
            rng.integers(0, n, e).astype(np.int32),
            rng.random(e).astype(np.float32))


@pytest.fixture(scope="module")
def native_built():
    ok = runtime.available()
    if not ok:
        pytest.skip("g++ unavailable; native runtime not built")
    return ok


class TestCoalesce:
    def test_matches_dense(self, native_built):
        row, col, w = random_graph()
        r, c, ww = runtime.coalesce(row, col, w)
        dense = np.zeros((200, 200), np.float64)
        np.add.at(dense, (row, col), w)
        dense2 = np.zeros((200, 200), np.float64)
        np.add.at(dense2, (r, c), ww)
        np.testing.assert_allclose(dense2, dense, rtol=1e-5, atol=1e-6)
        # sorted + unique
        key = r.astype(np.int64) * 200 + c
        assert (np.diff(key) > 0).all()


class TestLCC:
    def test_matches_scipy(self, native_built):
        row = np.array([0, 1, 2, 5, 6], np.int32)
        col = np.array([1, 2, 0, 6, 7], np.int32)
        m = runtime.lcc_mask(row, col, 9)
        assert set(np.where(m)[0].tolist()) == {0, 1, 2}

    def test_large_random(self, native_built):
        row, col, _ = random_graph(n=500, e=600, seed=3)
        m = runtime.lcc_mask(row, col, 500)
        from graph_neural_pde_tpu.data.datasets import largest_connected_component
        keep = largest_connected_component(
            np.stack([row.astype(np.int64), col.astype(np.int64)]), 500)
        want = np.zeros(500, bool)
        want[keep] = True
        assert (m == want).all()


class TestRandomWalks:
    def test_walks_follow_edges(self, native_built):
        n = 12
        row = np.concatenate([np.arange(n), (np.arange(n) + 1) % n]).astype(np.int32)
        col = np.concatenate([(np.arange(n) + 1) % n, np.arange(n)]).astype(np.int32)
        walks = runtime.random_walks(row, col, n, walk_length=6,
                                     walks_per_node=3)
        assert walks.shape == (36, 7)
        nbrs = {i: {(i + 1) % n, (i - 1) % n} for i in range(n)}
        for w in walks:
            for a, b in zip(w[:-1], w[1:]):
                assert b in nbrs[a]


class TestNativePlan:
    def test_matches_python_builder(self, native_built):
        from graph_neural_pde_tpu.ops.pallas import plan as planmod
        row, col, w = random_graph(n=300, e=900, seed=1)
        # native path
        p_nat = planmod.build_block_plan(row, col, w, num_nodes=300,
                                         block_n=128, chunk=128)
        # force python path
        orig = planmod.np.asarray  # noqa
        import graph_neural_pde_tpu.runtime as rt
        saved = rt.build_block_plan_native
        rt.build_block_plan_native = lambda *a, **k: None
        try:
            p_py = planmod.build_block_plan(row, col, w, num_nodes=300,
                                            block_n=128, chunk=128)
        finally:
            rt.build_block_plan_native = saved
        assert p_nat.n_chunks == p_py.n_chunks
        np.testing.assert_array_equal(np.asarray(p_nat.chunk_rows),
                                      np.asarray(p_py.chunk_rows))
        np.testing.assert_array_equal(np.asarray(p_nat.chunk_cols),
                                      np.asarray(p_py.chunk_cols))
        np.testing.assert_array_equal(np.asarray(p_nat.valid),
                                      np.asarray(p_py.valid))
        # same edge multiset per chunk (order within a bucket may differ
        # between stable sorts only if keys tie — they shouldn't here)
        np.testing.assert_array_equal(np.asarray(p_nat.row),
                                      np.asarray(p_py.row))
        np.testing.assert_array_equal(np.asarray(p_nat.col),
                                      np.asarray(p_py.col))
        np.testing.assert_allclose(np.asarray(p_nat.weight),
                                   np.asarray(p_py.weight))

    def test_spmm_on_native_plan(self, native_built):
        import jax.numpy as jnp
        from graph_neural_pde_tpu.ops.pallas.spmm_blocked import _spmm_call
        from graph_neural_pde_tpu.ops.pallas.plan import build_block_plan
        row, col, w = random_graph(n=250, e=700, seed=2)
        plan = build_block_plan(row, col, w, num_nodes=250, block_n=128,
                                chunk=128)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(plan.num_nodes, 32)).astype(np.float32)
        got = np.asarray(_spmm_call(plan, jnp.asarray(x),
                                    jnp.asarray(plan.weight)))
        dense = np.zeros((plan.num_nodes, plan.num_nodes), np.float32)
        np.add.at(dense, (row, col), w)
        np.testing.assert_allclose(got, dense @ x, rtol=1e-4, atol=1e-4)


class TestNativeStripePlan:
    def test_native_matches_numpy_builder(self):
        """gc_stripe_count/fill produce the exact numpy-planner layout."""
        from graph_neural_pde_tpu import runtime
        from graph_neural_pde_tpu.ops.pallas import stripe
        if not runtime.available():
            import pytest
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(0)
        n, e = 101, 700
        row = np.sort(rng.integers(0, n, e).astype(np.int32))
        mask = rng.random(e) < 0.9
        # force the numpy path by monkeypatching the native hook
        import graph_neural_pde_tpu.runtime as rt
        native = stripe.build_stripe_plan(row, mask, num_nodes=n,
                                          block_n=16, chunk=32)
        orig = rt.build_stripe_plan_native
        try:
            rt.build_stripe_plan_native = lambda *a, **k: None
            ref = stripe.build_stripe_plan(row, mask, num_nodes=n,
                                           block_n=16, chunk=32)
        finally:
            rt.build_stripe_plan_native = orig
        np.testing.assert_array_equal(native.row_local, ref.row_local)
        np.testing.assert_array_equal(native.valid, ref.valid)
        np.testing.assert_array_equal(native.chunk_rows, ref.chunk_rows)
        np.testing.assert_array_equal(native.slot_of_edge[mask],
                                      ref.slot_of_edge[mask])
        np.testing.assert_array_equal(native.node_degree, ref.node_degree)
        assert native.num_nodes == ref.num_nodes
