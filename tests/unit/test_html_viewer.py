"""Interactive HTML scene artifact: embedded data round-trips and the
document is a complete standalone page (ref plots.py:12-65 parity
artifact)."""
import base64
import re

import numpy as np

from mvsdf_tpu.eval.html_viewer import write_scene_html


def _extract(html, name, dtype):
    m = re.search(rf'decode\("([A-Za-z0-9+/=]*)",{name}\)', html)
    assert m, f"missing {name} payload"
    return np.frombuffer(base64.b64decode(m.group(1)), dtype)


def test_scene_html_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(80, 3)).astype(np.int64)
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(3, 3))
    ind = rng.uniform(size=50).astype(np.float32)
    pts = rng.normal(size=(200, 3)).astype(np.float32)

    path = write_scene_html(str(tmp_path / "scene.html"), verts, faces,
                            poses=poses, vert_colors=ind, points=pts)
    html = open(path).read()
    assert html.startswith("<!DOCTYPE html>")
    assert "</html>" in html
    assert "http://" not in html and "https://" not in html  # zero-egress

    inter = _extract(html, "Float32Array", np.float32)
    # first payload is interleaved pos+color: 50 verts x 6 floats
    assert inter.size == 50 * 6
    got = inter.reshape(50, 6)
    np.testing.assert_allclose(got[:, :3], verts, rtol=1e-6)
    # scalar indicator -> red/green channels (ref plots.py:200-203)
    np.testing.assert_allclose(got[:, 3], ind, rtol=1e-6)
    np.testing.assert_allclose(got[:, 4], 1.0 - ind, rtol=1e-6)

    f = _extract(html, "Uint32Array", np.uint32)
    np.testing.assert_array_equal(f.reshape(80, 3), faces)


def test_scene_html_decimation(tmp_path):
    rng = np.random.default_rng(1)
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, size=(500, 3)).astype(np.int64)
    path = write_scene_html(str(tmp_path / "s.html"), verts, faces,
                            max_faces=100)
    f = _extract(open(path).read(), "Uint32Array", np.uint32)
    assert f.size == 100 * 3


def test_scene_html_no_cameras_no_points(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    path = write_scene_html(str(tmp_path / "m.html"), verts, faces)
    html = open(path).read()
    assert 'decode("",Float32Array)' in html  # empty line/point payloads
