"""Config + live-options schema vs. the reference surfaces.

Coercion table: diffusert/server.py:171-187.  Defaults:
client/src/lib/pages/home/index.tsx:35-47.  config.yaml keys:
diffusert/config.yaml:1-5.
"""

import yaml

from videosd_tpu.config import (
    ServerConfig,
    StreamOptions,
    coerce_option,
    coerce_options,
    default_options,
    load_config,
)


def test_coercion_table_matches_reference():
    msg = {
        "strength": "0.7",
        "steps": "6",
        "guidance_scale": "3",
        "controlnet_scale": "1.5",
        "style_fidelity": "0.5",
        "seed": "99",
        "ref": True,
        "controlnet": False,
        "prompt": "hello",
        "deepcache_interval": "2",
    }
    out = coerce_options(msg)
    assert out == {
        "strength": 0.7,
        "steps": 6,
        "guidance_scale": 3.0,
        "controlnet_scale": 1.5,
        "style_fidelity": 0.5,
        "seed": 99,
        "ref": True,
        "controlnet": False,
        "prompt": "hello",
        "deepcache_interval": 2,
    }
    assert isinstance(out["steps"], int) and isinstance(out["strength"], float)
    assert isinstance(out["deepcache_interval"], int)


def test_unknown_keys_pass_through():
    assert coerce_option("set_ref", 1) == 1
    assert coerce_options({"custom": "x"}) == {"custom": "x"}


def test_client_defaults():
    d = default_options()
    assert d["strength"] == 0.6
    assert d["guidance_scale"] == 5.0
    assert d["steps"] == 4
    assert d["seed"] == 23
    assert d["ref"] is False
    assert d["style_fidelity"] == 1.0
    assert d["controlnet"] is True
    assert d["controlnet_scale"] == 2.0
    assert d["width"] == 512 and d["height"] == 512


def test_stream_options_from_dict():
    opts = StreamOptions.from_dict({"strength": "0.3", "width": 768, "junk": 1})
    assert opts.strength == 0.3 and opts.width == 768


def test_load_config_reference_keys(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        yaml.safe_dump(
            {
                "model": "SG161222/Realistic_Vision_V5.1_noVAE",
                "controlnet": "lllyasviel/control_v11p_sd15_canny",
                "gpus": 4,
                "compile": False,
            }
        )
    )
    cfg = load_config(str(p))
    assert cfg.model == "SG161222/Realistic_Vision_V5.1_noVAE"
    assert cfg.gpus == 4 and cfg.compile is False
    assert cfg.mesh_data == 4 and cfg.mesh_model == 1


def test_server_config_defaults():
    cfg = ServerConfig.from_dict({})
    assert cfg.family == "sd15" and cfg.dtype == "bfloat16"


def test_option_defaults_coerced_and_validated():
    from videosd_tpu.config import ServerConfig

    cfg = ServerConfig.from_dict(
        {"option_defaults": {"controlnet_interval": "4", "strength": "0.4"}}
    )
    assert cfg.option_defaults == {"controlnet_interval": 4, "strength": 0.4}

    import pytest

    with pytest.raises(ValueError):
        ServerConfig.from_dict({"option_defaults": ["not", "a", "mapping"]})
