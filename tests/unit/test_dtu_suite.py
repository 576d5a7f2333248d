"""Unit tests for the DTU suite runner's pure helpers (scripts/dtu_suite.py)."""
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
spec = importlib.util.spec_from_file_location(
    "dtu_suite", os.path.join(REPO, "scripts", "dtu_suite.py"))
dtu_suite = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dtu_suite)


def test_scan_id():
    assert dtu_suite.scan_id("scan114") == 114
    assert dtu_suite.scan_id("24") == 24
    assert dtu_suite.scan_id("nope") is None


def test_find_data_dir(tmp_path):
    # reference layout: scan24/imfunc4/cameras_hd.npz (ref README.md:38)
    scan = tmp_path / "scan24"
    (scan / "imfunc4").mkdir(parents=True)
    (scan / "imfunc4" / "cameras_hd.npz").write_bytes(b"")
    assert dtu_suite.find_data_dir(str(scan)) == str(scan / "imfunc4")
    # flat layout: cameras_hd.npz directly in the scan dir
    flat = tmp_path / "scan37"
    flat.mkdir()
    (flat / "cameras_hd.npz").write_bytes(b"")
    assert dtu_suite.find_data_dir(str(flat)) == str(flat)
    # other inner-dir name
    other = tmp_path / "scan40"
    (other / "scene").mkdir(parents=True)
    (other / "scene" / "cameras_hd.npz").write_bytes(b"")
    assert dtu_suite.find_data_dir(str(other)) == str(other / "scene")


def test_parsers(tmp_path):
    (tmp_path / "psnr.txt").write_text(
        "RENDERING EVALUATION x: psnr mean = 25.72 ; psnr std = 1.00\n")
    (tmp_path / "chamfer.txt").write_text(
        "DTU EVALUATION x: accuracy = 0.4000 ; completeness = 0.5000 ; "
        "overall = 0.4500\n")
    assert dtu_suite.parse_psnr(str(tmp_path)) == 25.72
    ch = dtu_suite.parse_chamfer(str(tmp_path))
    assert ch == {"accuracy": 0.4, "completeness": 0.5, "overall": 0.45}
    assert dtu_suite.parse_psnr(str(tmp_path / "missing")) is None
    assert dtu_suite.parse_chamfer(str(tmp_path / "missing")) is None


def test_reference_table_matches_survey():
    # 15 scans, published means (SURVEY.md section 6)
    vals = list(dtu_suite.REFERENCE_TABLE.values())
    assert len(vals) == 15
    assert abs(sum(v[0] for v in vals) / 15 - 0.890) < 5e-4
    assert abs(sum(v[1] for v in vals) / 15 - 25.72) < 5e-3
