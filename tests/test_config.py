"""Config/registry tests: inheritance, overrides, attribute access, registry."""

import pytest

from infinite_video_tpu.utils.config import Config, apply_overrides, load_config
from infinite_video_tpu.utils.registry import registry


def test_config_attribute_access():
    c = Config({"model": {"alpha": 0.75, "ltm": {"num_basis": 256}}})
    assert c.model.alpha == 0.75
    assert c.model.ltm.num_basis == 256
    c.model.alpha = 1.0
    assert c["model"]["alpha"] == 1.0
    with pytest.raises(AttributeError):
        _ = c.nonexistent


def test_yaml_base_inheritance_and_overrides(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "model:\n  arch: infvideollama\n  alpha: 0.75\nrun:\n  seed: 42\n")
    (tmp_path / "child.yaml").write_text(
        "_base_: base.yaml\nmodel:\n  alpha: 1.0\n")
    cfg = load_config(str(tmp_path / "child.yaml"),
                      overrides=["run.seed=7", "model.num_basis=64",
                                 "model.sticky=True"])
    assert cfg.model.arch == "infvideollama"   # inherited
    assert cfg.model.alpha == 1.0              # overridden by child
    assert cfg.run.seed == 7                   # dotlist
    assert cfg.model.num_basis == 64 and cfg.model.sticky is True


def test_python_config_file(tmp_path):
    (tmp_path / "cfg.py").write_text(
        "num_frames = 16\nmodel = dict(name='vc2', tau=0.75)\n")
    cfg = load_config(str(tmp_path / "cfg.py"))
    assert cfg.num_frames == 16
    assert cfg.model.tau == 0.75


def test_json_config(tmp_path):
    (tmp_path / "c.json").write_text('{"model": {"num_basis": 64}}')
    cfg = load_config(str(tmp_path / "c.json"))
    assert cfg.model.num_basis == 64


def test_override_value_parsing():
    cfg = Config({})
    apply_overrides(cfg, ["a.b=1", "a.c=0.5", "a.d=[1,2]", "a.e=text",
                          "a.f=None", "a.g=False"])
    assert cfg.a.b == 1 and cfg.a.c == 0.5 and cfg.a.d == [1, 2]
    assert cfg.a.e == "text" and cfg.a.f is None and cfg.a.g is False


def test_registry_roundtrip():
    @registry.register_model("toy_model_for_test")
    class Toy:
        pass

    assert registry.get_model_class("toy_model_for_test") is Toy
    assert "toy_model_for_test" in registry.list("model")
    with pytest.raises(KeyError):
        @registry.register_model("toy_model_for_test")
        class Other:
            pass
