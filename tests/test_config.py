"""Config front-end parity (reference CONFIG_SCHEMA, __init__.py:55-67):
required db_url, default chunk_time_interval (30 days in µs), HA
include/exclude filter shape with ensure_list coercion and entity-id
validation, unknown-key rejection inside the block, ALLOW_EXTRA outside."""

import pytest

from ltss_spark.config import (
    DEFAULT_CHUNK_TIME_INTERVAL,
    ConfigError,
    LtssConfig,
    load_yaml_config,
    parse_config,
)


def test_minimal_config_defaults():
    cfg = parse_config({"ltss": {"db_url": "postgresql://db/ha"}})
    assert cfg == LtssConfig(db_url="postgresql://db/ha")
    assert cfg.chunk_time_interval == DEFAULT_CHUNK_TIME_INTERVAL == 2_592_000_000_000
    # empty filter keeps everything (HA case 1)
    assert cfg.entity_filter.include_domains == ()


def test_full_yaml_block_round_trip(spark):
    """The literal YAML a reference user has in configuration.yaml, parsed
    and wired end-to-end: the compiled filter Column implements the same
    include-over-exclude precedence on a real frame."""
    cfg = load_yaml_config(
        """
homeassistant:
  name: Home
ltss:
  db_url: postgresql://user:pw@host:5432/ha
  chunk_time_interval: 86400000000
  include:
    domains: sensor
    entity_globs:
      - light.kitchen_*
  exclude:
    entities:
      - sensor.noisy
"""
    )
    assert cfg.db_url == "postgresql://user:pw@host:5432/ha"
    assert cfg.chunk_time_interval == 86_400_000_000
    assert cfg.entity_filter.include_domains == ("sensor",)  # ensure_list
    assert cfg.entity_filter.include_globs == ("light.kitchen_*",)
    assert cfg.entity_filter.exclude_entities == ("sensor.noisy",)

    df = spark.createDataFrame(
        [("sensor.temp",), ("sensor.noisy",), ("light.kitchen_1",), ("person.x",)],
        "entity_id string",
    )
    kept = {r.entity_id for r in df.filter(cfg.entity_filter.expr()).collect()}
    assert kept == {"sensor.temp", "light.kitchen_1"}


def test_top_level_extra_keys_allowed_block_strict():
    # extra=vol.ALLOW_EXTRA at top level...
    parse_config({"ltss": {"db_url": "x://y"}, "recorder": {"purge": 1}})
    # ...but the block itself is PREVENT_EXTRA
    with pytest.raises(ConfigError, match="unknown keys.*db_urll"):
        parse_config({"ltss": {"db_url": "x://y", "db_urll": "typo"}})
    with pytest.raises(ConfigError, match="include: unknown keys"):
        parse_config(
            {"ltss": {"db_url": "x://y", "include": {"domain": ["sensor"]}}}
        )


@pytest.mark.parametrize(
    "block, match",
    [
        ({}, "db_url"),
        ({"db_url": ""}, "db_url"),
        ({"db_url": 5}, "db_url"),
        ({"db_url": "x://y", "chunk_time_interval": 0}, "positive integer"),
        ({"db_url": "x://y", "chunk_time_interval": -3}, "positive integer"),
        ({"db_url": "x://y", "chunk_time_interval": True}, "positive integer"),
        ({"db_url": "x://y", "chunk_time_interval": "30d"}, "positive integer"),
        (
            {"db_url": "x://y", "include": {"entities": ["notanentity"]}},
            "not a valid entity id",
        ),
        (
            {"db_url": "x://y", "exclude": {"entities": ["Sensor.Upper"]}},
            "not a valid entity id",
        ),
        ({"db_url": "x://y", "include": {"domains": [7]}}, "non-empty string"),
        ({"db_url": "x://y", "include": "sensor"}, "expected a mapping"),
    ],
)
def test_invalid_configs_raise(block, match):
    with pytest.raises(ConfigError, match=match):
        parse_config({"ltss": block})


def test_missing_block_and_bad_yaml():
    with pytest.raises(ConfigError, match="missing the 'ltss' block"):
        parse_config({"recorder": {}})
    with pytest.raises(ConfigError, match="invalid YAML"):
        load_yaml_config("ltss: [unclosed")
    with pytest.raises(ConfigError, match="missing the 'ltss' block"):
        load_yaml_config("")
