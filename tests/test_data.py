"""Data-layer tests with synthetic raw files in the real on-disk formats."""

import gzip
import os
import pickle

import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.datasets import (
    generate_random_splits,
    get_dataset,
    largest_connected_component,
    load_planetoid,
    load_shchur_npz,
    restrict_to_nodes,
    set_train_val_test_split,
)


def write_fake_planetoid(root, name="Cora", n_train=12, n_test=8, n_other=20,
                         f=6, c=3, seed=0):
    """Write tiny ind.* files in the true planetoid pickle layout."""
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    lname = name.lower()
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    n_allx = n_train + n_other
    n = n_allx + n_test

    def onehot(k):
        y = np.zeros((k, c), np.int32)
        y[np.arange(k), rng.integers(0, c, k)] = 1
        return y

    x = sp.csr_matrix(rng.random((n_train, f)).astype(np.float32))
    allx = sp.csr_matrix(rng.random((n_allx, f)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_test, f)).astype(np.float32))
    y, ally, ty = onehot(n_train), onehot(n_allx), onehot(n_test)
    graph = {i: [int(v) for v in rng.integers(0, n, 3)] for i in range(n)}
    test_index = rng.permutation(np.arange(n_allx, n))

    for suffix, obj in [("x", x), ("tx", tx), ("allx", allx), ("y", y),
                        ("ty", ty), ("ally", ally), ("graph", graph)]:
        with open(os.path.join(raw, f"ind.{lname}.{suffix}"), "wb") as fh:
            pickle.dump(obj, fh)
    with open(os.path.join(raw, f"ind.{lname}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_index))
    return n, f, c


class TestPlanetoid:
    def test_roundtrip(self, tmp_path):
        n, f, c = write_fake_planetoid(str(tmp_path))
        x, y, ei, tm, vm, sm = load_planetoid(str(tmp_path), "Cora")
        assert x.shape == (n, f) and y.shape == (n,)
        assert tm.sum() == 12 and sm.sum() == 8
        assert not (tm & sm).any() and not (tm & vm).any()
        # undirected
        pairs = set(map(tuple, ei.T.tolist()))
        assert all((b, a) in pairs for a, b in pairs)

    def test_get_dataset_from_files(self, tmp_path):
        write_fake_planetoid(str(tmp_path))
        cfg = Config(dataset="Cora", edge_pad_multiple=16)
        ds = get_dataset(cfg, str(tmp_path), use_lcc=False,
                         synthetic_fallback=False)
        assert ds.num_classes == 3 and ds.name == "Cora"
        assert int(ds.train_mask.sum()) == 12


class TestShchurNpz:
    def test_roundtrip(self, tmp_path):
        import scipy.sparse as sp
        rng = np.random.default_rng(0)
        n, f = 30, 5
        adj = sp.random(n, n, density=0.1, format="csr",
                        random_state=np.random.RandomState(0))
        attr = sp.random(n, f, density=0.5, format="csr",
                         random_state=np.random.RandomState(1))
        d = os.path.join(str(tmp_path), "Computers", "raw")
        os.makedirs(d)
        np.savez(os.path.join(d, "amazon_electronics_computers.npz"),
                 adj_data=adj.data, adj_indices=adj.indices,
                 adj_indptr=adj.indptr, adj_shape=adj.shape,
                 attr_data=attr.data, attr_indices=attr.indices,
                 attr_indptr=attr.indptr, attr_shape=attr.shape,
                 labels=rng.integers(0, 4, n))
        x, y, ei = load_shchur_npz(str(tmp_path), "Computers",
                                   "amazon_electronics_computers.npz")
        assert x.shape == (30, 5) and y.shape == (30,)


class TestLCC:
    def test_two_components(self):
        # component {0,1,2} (triangle) and {3,4} (edge)
        ei = np.array([[0, 1, 2, 3], [1, 2, 0, 4]], np.int64)
        lcc = largest_connected_component(ei, 5)
        assert set(lcc.tolist()) == {0, 1, 2}
        ei2 = restrict_to_nodes(ei, lcc)
        assert ei2.max() <= 2 and ei2.shape[1] == 3

    def test_isolated_nodes(self):
        ei = np.array([[0], [1]], np.int64)
        lcc = largest_connected_component(ei, 4)
        assert set(lcc.tolist()) == {0, 1}


class TestSplits:
    def test_development_split_counts(self):
        rng = np.random.default_rng(0)
        y = rng.integers(0, 4, 2000)
        tm, vm, sm = set_train_val_test_split(12345, y, num_development=500,
                                              num_per_class=20)
        assert tm.sum() == 80
        assert vm.sum() == 500 - 80
        assert sm.sum() == 1500
        assert not (tm & vm).any() and not (tm & sm).any()

    def test_split_deterministic(self):
        y = np.random.default_rng(0).integers(0, 3, 1000)
        a = set_train_val_test_split(7, y, 300)
        b = set_train_val_test_split(7, y, 300)
        assert all((x == z).all() for x, z in zip(a, b))

    def test_random_splits_rates(self):
        y = np.zeros(1000, np.int64)
        tm, vm, sm = generate_random_splits(y, seed=1)
        assert tm.sum() == 600 and vm.sum() == 200 and sm.sum() == 200


class TestFallback:
    def test_synthetic_fallback(self, tmp_path):
        cfg = Config(dataset="Citeseer")
        ds = get_dataset(cfg, str(tmp_path), synthetic_fallback=True)
        assert ds.name == "Citeseer-synthetic"
        assert ds.num_classes == 6

    def test_no_fallback_raises(self, tmp_path):
        cfg = Config(dataset="Citeseer")
        with pytest.raises(FileNotFoundError):
            get_dataset(cfg, str(tmp_path), synthetic_fallback=False)


class TestProcessedCache:
    def test_second_load_reads_cache(self, tmp_path):
        """Raw planetoid parse once; second get_dataset hits the npz cache."""
        import pickle
        import scipy.sparse as sp
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.datasets import get_dataset

        # craft a tiny raw planetoid layout
        rng = np.random.default_rng(0)
        n_tr, n_te, n_all, f, c = 4, 3, 8, 5, 2
        raw = tmp_path / "Cora" / "raw"
        raw.mkdir(parents=True)

        def dump(name, obj):
            with open(raw / f"ind.cora.{name}", "wb") as fh:
                pickle.dump(obj, fh)

        x_tr = sp.csr_matrix(rng.random((n_tr, f)).astype(np.float32))
        allx = sp.csr_matrix(rng.random((n_all, f)).astype(np.float32))
        tx = sp.csr_matrix(rng.random((n_te, f)).astype(np.float32))
        y_oh = np.eye(c)[rng.integers(0, c, n_tr)]
        ally = np.eye(c)[rng.integers(0, c, n_all)]
        ty = np.eye(c)[rng.integers(0, c, n_te)]
        graph = {i: [(i + 1) % (n_all + n_te)] for i in range(n_all + n_te)}
        dump("x", x_tr); dump("tx", tx); dump("allx", allx)
        dump("y", y_oh); dump("ty", ty); dump("ally", ally)
        dump("graph", graph)
        with open(raw / "ind.cora.test.index", "w") as fh:
            fh.write("\n".join(str(n_all + i) for i in range(n_te)))

        cfg = Config(dataset="Cora", edge_pad_multiple=4)
        d1 = get_dataset(cfg, str(tmp_path), synthetic_fallback=False)
        cache = tmp_path / "processed_npz" / "Cora.npz"
        assert cache.exists()
        d2 = get_dataset(cfg, str(tmp_path), synthetic_fallback=False)
        np.testing.assert_array_equal(np.asarray(d1.x), np.asarray(d2.x))
        np.testing.assert_array_equal(np.asarray(d1.y), np.asarray(d2.y))
        np.testing.assert_array_equal(np.asarray(d1.train_mask),
                                      np.asarray(d2.train_mask))
