import os
import textwrap

import pytest

from dreammat_tpu.utils.config import (
    ExperimentConfig,
    load_config,
    merge_dicts,
    parse_dotlist,
    parse_structured,
    resolve_interpolations,
)
from dreammat_tpu.utils.schedule import C, C_jax


def test_parse_dotlist():
    d = parse_dotlist(["a.b=1", "a.c=hello", "d=[1, 2]", "e=true", "f=1.5"])
    assert d == {"a": {"b": 1, "c": "hello"}, "d": [1, 2], "e": True, "f": 1.5}


def test_merge_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = merge_dicts(base, {"a": {"b": 10}})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3}


def test_interpolation_rmspace():
    cfg = {
        "tag": "${rmspace:${system.prompt},_}",
        "system": {"prompt": "a red apple"},
    }
    out = resolve_interpolations(cfg)
    assert out["tag"] == "a_red_apple"


def test_parse_structured_unknown_key():
    from dataclasses import dataclass

    @dataclass
    class Cfg:
        x: int = 1

    with pytest.raises(ValueError):
        parse_structured(Cfg, {"y": 2})
    assert parse_structured(Cfg, {"x": 5}).x == 5


def test_parse_structured_missing_required():
    from dataclasses import dataclass

    @dataclass
    class Cfg:
        x: str = "???"

    with pytest.raises(ValueError):
        parse_structured(Cfg, {})


def test_load_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        textwrap.dedent(
            """
            name: test_exp
            tag: "${rmspace:${system.prompt_processor.prompt},_}"
            data_type: dummy-data
            system_type: dummy-system
            system:
              prompt_processor:
                prompt: ???
            trainer:
              max_steps: 100
            """
        )
    )
    cfg = load_config(str(p), cli_args=["system.prompt_processor.prompt=a red apple"])
    assert cfg.name == "test_exp"
    assert cfg.tag == "a_red_apple"
    assert cfg.trainer.max_steps == 100
    assert cfg.system["prompt_processor"]["prompt"] == "a red apple"
    assert cfg.trial_dir.startswith(os.path.join("outputs", "test_exp"))


def test_schedule_scalar_passthrough():
    assert C(0.5, 0, 100) == 0.5
    assert C(3, 0, 100) == 3


def test_schedule_interp():
    sched = [0, -1.0, -0.5, 2000]
    assert C(sched, 0, 0) == -1.0
    assert C(sched, 0, 2000) == -0.5
    assert abs(C(sched, 0, 1000) - (-0.75)) < 1e-6
    assert C(sched, 0, 99999) == -0.5
    # 3-element form prepends start_step=0
    assert C([0.2, 0.02, 501], 0, 0) == 0.2


def test_schedule_jax_matches_python():
    import jax.numpy as jnp

    sched = [500, 0.2, 0.02, 501]
    for step in [0, 250, 500, 501, 1000]:
        assert abs(float(C_jax(sched, jnp.array(step))) - C(sched, 0, step)) < 1e-6


def test_registry():
    import dreammat_tpu

    @dreammat_tpu.register("unit-test-component")
    class Foo:
        pass

    assert dreammat_tpu.find("unit-test-component") is Foo
