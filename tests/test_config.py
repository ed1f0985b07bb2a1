"""A1 parity — settings handling (``pipeline/pipeline.py::set_config_from_file``
raising InvalidConfigException on missing/unparseable settings)."""

import json

import pytest

from wprdc_etl_spark.config import EngineConfig
from wprdc_etl_spark.exceptions import InvalidConfigException


def test_from_file_roundtrip(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text(json.dumps({"app_name": "x", "n_buckets": 128, "watermark_delay": "1 hour"}))
    cfg = EngineConfig.from_file(str(p))
    assert cfg.app_name == "x" and cfg.n_buckets == 128 and cfg.watermark_delay == "1 hour"
    assert cfg.shuffle_partitions == 32  # defaults preserved


def test_missing_file_raises():
    with pytest.raises(InvalidConfigException, match="not found"):
        EngineConfig.from_file("/nope/settings.json")


def test_unparseable_raises(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{not json")
    with pytest.raises(InvalidConfigException, match="cannot parse"):
        EngineConfig.from_file(str(p))


def test_unknown_keys_raise(tmp_path):
    p = tmp_path / "extra.json"
    p.write_text(json.dumps({"app_name": "x", "ckan_api_key": "secret"}))
    with pytest.raises(InvalidConfigException, match="unknown settings keys"):
        EngineConfig.from_file(str(p))
