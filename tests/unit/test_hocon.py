import os

from mvsdf_tpu.hocon import parse_hocon, config_from_hocon

REF_CONF = "/root/reference/code/confs/mvsdf_dtu.conf"


def test_parse_reference_conf():
    if not os.path.exists(REF_CONF):
        import pytest
        pytest.skip("reference conf not mounted")
    with open(REF_CONF) as f:
        conf = parse_hocon(f.read())
    assert conf["train"]["learning_rate"] == 2e-4
    assert conf["train"]["num_pixels"] == 4096
    assert conf["train"]["sched_milestones"] == ["4/6", "5/6"]
    assert conf["model"]["feature_vector_size"] == 256
    assert conf["model"]["implicit_network"]["dims"] == [512] * 8
    assert conf["model"]["implicit_network"]["skip_in"] == [4]
    assert conf["model"]["implicit_network"]["bias"] == 0.6
    assert conf["model"]["ray_tracer"]["sdf_threshold"] == 5.0e-5
    assert conf["model"]["rendering_network"]["mode"] == "idr"


def test_config_from_reference_conf():
    if not os.path.exists(REF_CONF):
        import pytest
        pytest.skip("reference conf not mounted")
    cfg = config_from_hocon(REF_CONF)
    assert cfg.model.implicit.dims == (512,) * 8
    assert cfg.model.implicit.skip_in == (4,)
    assert cfg.model.implicit.multires == 6
    assert cfg.model.render.multires_view == 4
    assert cfg.model.tracer.sphere_tracing_iters == 10
    assert cfg.train.num_pixels == 4096
    assert abs(cfg.train.sched_milestones[0] - 4 / 6) < 1e-9
    assert cfg.train.plot_freq == 1 / 12


def test_parse_inline_and_nested():
    txt = """
    a{
        b = 1
        c = [1, 2, 3]
        d {
            e = hello
            f = true
        }
    }
    g = 2.5e-3
    """
    c = parse_hocon(txt)
    assert c["a"]["b"] == 1
    assert c["a"]["c"] == [1, 2, 3]
    assert c["a"]["d"]["e"] == "hello"
    assert c["a"]["d"]["f"] is True
    assert c["g"] == 2.5e-3
