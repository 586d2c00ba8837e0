"""Synthetic dataset fixtures in the reference's on-disk formats, used by
tests and by the verification CLI drives (real datasets require downloads)."""

import gzip
import json
import os

import numpy as np


def make_varmisuse_dir(root: str, num_shards=2, samples_per_shard=6, seed=0):
    """Write graphs-{train,valid,test}/ shards in the ICLR'18 raw schema
    consumed by the reference loader (varmisuse_task.py:69-136)."""
    rng = np.random.RandomState(seed)
    idents = ["fooBar", "baz_qux", "myVariable", "count", "totalSum",
              "getValue", "listItems", "indexOf", "tempResult", "dataBuffer"]
    punct = ["(", ")", "{", "}", ";", "=", "+"]

    def make_sample():
        n_base = rng.randint(12, 25)
        node_labels = {}
        for v in range(n_base):
            if rng.rand() < 0.6:
                node_labels[str(v)] = idents[rng.randint(len(idents))]
            else:
                node_labels[str(v)] = punct[rng.randint(len(punct))]
        edges = {}
        for et in ["Child", "NextToken", "LastUse"]:
            k = rng.randint(3, n_base)
            edges[et] = [
                [int(rng.randint(n_base)), int(rng.randint(n_base))]
                for _ in range(k)
            ]
        n_cands = rng.randint(2, 5)
        cand_nodes = rng.choice(n_base, size=n_cands, replace=False)
        correct = rng.randint(n_cands)
        return {
            "ContextGraph": {"NodeLabels": node_labels, "Edges": edges},
            "SlotDummyNode": int(rng.randint(n_base)),
            "SymbolCandidates": [
                {"SymbolDummyNode": int(c), "IsCorrect": bool(i == correct)}
                for i, c in enumerate(cand_nodes)
            ],
        }

    for fold in ["train", "valid", "test"]:
        d = os.path.join(root, "graphs-%s" % fold)
        os.makedirs(d, exist_ok=True)
        for shard in range(num_shards):
            with gzip.open(os.path.join(d, "chunk_%d.jsonl.gz" % shard), "wt") as f:
                for _ in range(samples_per_shard):
                    f.write(json.dumps(make_sample()) + "\n")
    return root


def make_ppi_dir(root: str, graphs_per_fold=None, nodes_per_graph=300,
                 fwd_edges_per_node=8, seed=0):
    """Write the DGL-format PPI files consumed by the reference loader
    (ppi_task.py:87-90)."""
    graphs_per_fold = graphs_per_fold or {"train": 4, "valid": 2, "test": 2}
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for fold, ng in graphs_per_fold.items():
        feats, labels, gids, links = [], [], [], []
        off = 0
        for g in range(ng):
            n = nodes_per_graph
            e = n * fwd_edges_per_node
            s = rng.randint(0, n, e) + off
            t = rng.randint(0, n, e) + off
            links.extend(
                {"source": int(a), "target": int(b)} for a, b in zip(s, t)
            )
            feats.append(rng.randn(n, 50).astype(np.float32))
            labels.append((rng.rand(n, 121) < 0.4).astype(np.float32))
            gids.append(np.full(n, g))
            off += n
        np.save(os.path.join(root, "%s_feats.npy" % fold), np.concatenate(feats))
        np.save(os.path.join(root, "%s_labels.npy" % fold), np.concatenate(labels))
        np.save(os.path.join(root, "%s_graph_id.npy" % fold), np.concatenate(gids))
        with open(os.path.join(root, "%s_graph.json" % fold), "w") as f:
            json.dump({"links": links}, f)
    return root


def make_planetoid_dir(root: str, dataset="cora", n=700, n_train=40,
                       n_test=60, num_feats=30, num_classes=7, seed=0):
    """Write ind.{dataset}.* Planetoid pickles (citation_network_utils.py)."""
    import pickle
    import scipy.sparse as sp
    from collections import defaultdict

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    x_all = sp.csr_matrix((rng.rand(n, num_feats) < 0.1).astype(np.float32))
    y_all = np.eye(num_classes)[rng.randint(0, num_classes, n)]
    graph = defaultdict(list)
    for _ in range(n * 3):
        a, b = rng.randint(0, n, 2)
        graph[int(a)].append(int(b))
    for v in range(n):
        graph.setdefault(v, [])
    test_idx = list(range(n - n_test, n))
    objs = {
        "x": x_all[:n_train], "y": y_all[:n_train],
        "tx": x_all[n - n_test:], "ty": y_all[n - n_test:],
        "allx": x_all[: n - n_test], "ally": y_all[: n - n_test],
        "graph": dict(graph),
    }
    for name, obj in objs.items():
        with open(os.path.join(root, "ind.%s.%s" % (dataset, name)), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(root, "ind.%s.test.index" % dataset), "w") as f:
        f.write("\n".join(str(i) for i in rng.permutation(test_idx)))
    return root


def make_planted_ppi_dir(root, graphs_per_fold=None, nodes_per_graph=50,
                         seed=0):
    """PPI fixture with a PLANTED per-node signal — label j is a
    deterministic function of the node's own features
    (labels[:, j] = feats[:, j % 50] > 0) — so a correctly-wired
    head/loss/metric pipeline can memorize the train fold to
    micro-F1 ~1.0 (tests/test_learnability.py)."""
    rng = np.random.RandomState(seed)
    graphs_per_fold = graphs_per_fold or {"train": 2, "valid": 1}
    os.makedirs(root, exist_ok=True)
    for fold, ng in graphs_per_fold.items():
        feats, labels, gids, links = [], [], [], []
        off = 0
        for g in range(ng):
            n = nodes_per_graph
            e = n * 4
            s = rng.randint(0, n, e) + off
            t = rng.randint(0, n, e) + off
            links.extend(
                {"source": int(a), "target": int(b)} for a, b in zip(s, t)
            )
            f = rng.randn(n, 50).astype(np.float32)
            lab = (f[:, np.arange(121) % 50] > 0).astype(np.float32)
            feats.append(f)
            labels.append(lab)
            gids.append(np.full(n, g))
            off += n
        np.save(os.path.join(root, "%s_feats.npy" % fold),
                np.concatenate(feats))
        np.save(os.path.join(root, "%s_labels.npy" % fold),
                np.concatenate(labels))
        np.save(os.path.join(root, "%s_graph_id.npy" % fold),
                np.concatenate(gids))
        with open(os.path.join(root, "%s_graph.json" % fold), "w") as f2:
            json.dump({"links": links}, f2)
    return root


def make_planted_varmisuse_dir(root, num_samples=50, seed=0,
                               folds=("train", "valid")):
    """VarMisuse fixture with a PLANTED signal: the CORRECT candidate's
    node label is always the marker identifier 'winnerVar', so the
    char-CNN + candidate head can reach accuracy ~1.0 on the train fold
    (tests/test_learnability.py)."""
    rng = np.random.RandomState(seed)
    idents = ["fooBar", "bazQux", "myVariable", "countTotal", "dataBuffer"]
    punct = ["(", ")", ";", "="]

    def make_sample():
        n = rng.randint(14, 22)
        node_labels = {}
        for v in range(n):
            node_labels[str(v)] = (
                idents[rng.randint(len(idents))]
                if rng.rand() < 0.6 else punct[rng.randint(len(punct))]
            )
        edges = {}
        for et in ["Child", "NextToken", "LastUse"]:
            k = rng.randint(6, n)
            edges[et] = [
                [int(rng.randint(n)), int(rng.randint(n))] for _ in range(k)
            ]
        cands = rng.choice(n, size=3, replace=False)
        correct = rng.randint(3)
        for i, c in enumerate(cands):
            node_labels[str(int(c))] = (
                "winnerVar" if i == correct
                else idents[rng.randint(len(idents))]
            )
        return {
            "ContextGraph": {"NodeLabels": node_labels, "Edges": edges},
            "SlotDummyNode": int(rng.randint(n)),
            "SymbolCandidates": [
                {"SymbolDummyNode": int(c), "IsCorrect": bool(i == correct)}
                for i, c in enumerate(cands)
            ],
        }

    for fold in folds:
        d = os.path.join(root, "graphs-%s" % fold)
        os.makedirs(d, exist_ok=True)
        with gzip.open(os.path.join(d, "chunk_0.jsonl.gz"), "wt") as f:
            for _ in range(num_samples):
                f.write(json.dumps(make_sample()) + "\n")
    return root


def make_planted_planetoid_dir(root, n=700, n_train=60, n_test=60,
                               num_feats=24, num_classes=5, seed=0):
    """Planetoid fixture with a PLANTED signal: class = argmax of the
    first `num_classes` feature columns (a deterministic function of the
    node's own features; argmax is invariant to the loader's row
    normalization), so the masked-CE head can reach train-mask accuracy
    ~1.0 (tests/test_learnability.py). n must cover the Kipf protocol's
    hardcoded 500-node validation mask (n_train + 500 + n_test <= n)."""
    import pickle
    import scipy.sparse as sp
    from collections import defaultdict

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    x_dense = rng.rand(n, num_feats).astype(np.float32)
    y_cls = np.argmax(x_dense[:, :num_classes], axis=1)
    x_all = sp.csr_matrix(x_dense)
    y_all = np.eye(num_classes)[y_cls]
    graph = defaultdict(list)
    for _ in range(n * 2):
        a, b = rng.randint(0, n, 2)
        graph[int(a)].append(int(b))
    for v in range(n):
        graph.setdefault(v, [])
    objs = {
        "x": x_all[:n_train], "y": y_all[:n_train],
        "tx": x_all[n - n_test:], "ty": y_all[n - n_test:],
        "allx": x_all[: n - n_test], "ally": y_all[: n - n_test],
        "graph": dict(graph),
    }
    for name, obj in objs.items():
        with open(os.path.join(root, "ind.cora.%s" % name), "wb") as f:
            pickle.dump(obj, f)
    with open(os.path.join(root, "ind.cora.test.index"), "w") as f:
        f.write("\n".join(
            str(i) for i in rng.permutation(list(range(n - n_test, n)))
        ))
    return root
