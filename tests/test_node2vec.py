"""node2vec embeddings (graph/node2vec.py): walk validity, cluster
structure, GMAN integration.

Reference counterpart: GMAN's paper trains its spatial embeddings with
node2vec; the reference repo ships neither GMAN nor node2vec — this is the
framework's opt-in implementation (``gman_se='node2vec'``).
"""

import numpy as np

from multistgraph_tpu.graph.node2vec import node2vec_embedding, node2vec_walks


def _two_cluster_graph(k=8, seed=0):
    """Two dense blocks joined by a single bridge edge."""
    rng = np.random.default_rng(seed)
    n = 2 * k
    a = np.zeros((n, n), np.float32)
    for lo in (0, k):
        blk = (rng.random((k, k)) < 0.9).astype(np.float32)
        a[lo:lo + k, lo:lo + k] = np.triu(blk, 1)
    a[0, k] = 1.0  # bridge
    a = a + a.T
    return a


def test_walks_follow_edges_and_shape():
    a = _two_cluster_graph()
    walks = node2vec_walks(a, num_walks=4, walk_length=12, seed=1)
    assert walks.shape == (4 * len(a), 12)
    sym = np.maximum(a, a.T)
    for row in walks[::7]:
        for u, v in zip(row[:-1], row[1:]):
            assert sym[u, v] > 0, (u, v)
    # walks start at every node, num_walks times
    assert np.bincount(walks[:, 0], minlength=len(a)).tolist() == [4] * len(a)


def test_isolated_node_self_loops():
    a = np.zeros((3, 3), np.float32)
    a[0, 1] = a[1, 0] = 1.0  # node 2 isolated
    walks = node2vec_walks(a, num_walks=2, walk_length=5, seed=0)
    iso = walks[walks[:, 0] == 2]
    assert (iso == 2).all()


def test_embedding_separates_clusters():
    a = _two_cluster_graph()
    k = len(a) // 2
    emb = node2vec_embedding(a, dim=8, num_walks=8, walk_length=30,
                             window=4, epochs=3, seed=0)
    assert emb.shape == (len(a), 8)
    assert np.isfinite(emb).all()
    sim = emb @ emb.T  # rows are unit-norm
    intra = (sim[:k, :k].sum() - k + sim[k:, k:].sum() - k) / (2 * k * (k - 1))
    inter = sim[:k, k:].mean()
    assert intra > inter + 0.2, (intra, inter)


def test_gman_builds_with_node2vec(synthetic_dataset, tmp_path):
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.models import get_model

    config = load_config(
        "traffic_state_pred", "GMAN", "SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset, "cache_dir": str(tmp_path / "c"),
            "output_dir": str(tmp_path / "o"), "input_window": 12,
            "output_window": 3, "load_external": True, "add_time_in_day": True,
            "batch_size": 4, "seed": 0, "gman_se": "node2vec",
            "n2v_walks": 4, "n2v_length": 20, "n2v_window": 3, "se_dim": 4,
            "num_heads": 2, "head_dim": 4, "num_blocks": 1,
        },
    )
    dataset = get_dataset(config)
    dataset.get_data()
    model = get_model(config, dataset.get_data_feature())
    assert model.spatial_emb.shape[1] == 4
    assert np.isfinite(np.asarray(model.spatial_emb)).all()
