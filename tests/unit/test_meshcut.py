import numpy as np
import pytest

from mvsdf_tpu.meshcut import mesh_cut, trim_mesh, face_adjacency_edges


def test_native_builds_and_trivial_cut():
    # two disconnected nodes: one source-labeled, one sink-labeled
    labels = np.array([True, False])
    edges = np.zeros((0, 3), np.uint32)
    out = mesh_cut(labels, edges)
    np.testing.assert_array_equal(out, [True, False])


def test_maxflow_matches_scipy():
    """Min-cut parity vs scipy.sparse.csgraph.maximum_flow on random
    mesh-like graphs (flow value must match; cut must be a valid s-t cut)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 60
        labels = rng.uniform(size=n) < 0.5
        # random sparse adjacency
        m = 150
        uv = rng.integers(0, n, (m, 2))
        uv = uv[uv[:, 0] != uv[:, 1]]
        cap = rng.integers(1, 6, (len(uv), 1))
        edges = np.concatenate([uv, cap], 1).astype(np.uint32)

        out = mesh_cut(labels, edges)
        # scipy graph: 0=s, 1=t, nodes shifted +2
        rows, cols, data = [], [], []
        for i in range(n):
            if labels[i]:
                rows.append(0)
                cols.append(i + 2)
            else:
                rows.append(i + 2)
                cols.append(1)
            data.append(1)
        for u, v, c in edges:
            rows += [u + 2, v + 2]
            cols += [v + 2, u + 2]
            data += [int(c), int(c)]
        g = csr_matrix((data, (rows, cols)), shape=(n + 2, n + 2))
        res = maximum_flow(g, 0, 1)

        # flow across our cut == scipy's max-flow value
        cut_cap = 0
        for i in range(n):
            if labels[i] and not out[i]:
                cut_cap += 1  # source arc cut
            if (not labels[i]) and out[i]:
                cut_cap += 1  # sink arc cut
        for u, v, c in edges:
            if out[u] != out[v]:
                cut_cap += int(c)
        assert cut_cap == res.flow_value, trial
        # source-labeled isolated nodes stay on source side
        # (cut validity is implied by cut_cap == maxflow via duality)


def test_face_adjacency():
    # two triangles sharing an edge + one isolated triangle
    faces = np.array([[0, 1, 2], [1, 2, 3], [4, 5, 6]])
    adj = face_adjacency_edges(faces)
    assert adj.shape == (1, 2)
    assert set(adj[0]) == {0, 1}


def test_trim_mesh_removes_low_confidence_island():
    # a strip of 6 faces; last two have high "red" (spurious) confidence
    verts = np.array([[i, j, 0] for i in range(5) for j in range(2)],
                     np.float32)

    def vid(i, j):
        return i * 2 + j

    faces = []
    for i in range(4):
        faces.append([vid(i, 0), vid(i + 1, 0), vid(i, 1)])
        faces.append([vid(i + 1, 0), vid(i + 1, 1), vid(i, 1)])
    faces = np.array(faces)
    colors = np.zeros((len(verts), 3), np.float32)
    colors[vid(4, 0)] = colors[vid(4, 1)] = colors[vid(3, 1)] = [1, 0, 0]
    v2, f2, c2 = trim_mesh(verts, faces, colors, thresh=15, smooth=1)
    assert len(f2) < len(faces)
    assert len(f2) >= 4
