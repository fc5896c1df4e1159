"""Config front-end — the reference's YAML ``ltss:`` block, validated.

The reference is configured from Home Assistant YAML and validates it with
voluptuous (CONFIG_SCHEMA, /root/reference/custom_components/ltss/
__init__.py:55-67): a required ``db_url``, an optional
``chunk_time_interval`` (default 30 days in microseconds) and HA's
include/exclude entity-filter block; its setup then extracts exactly three
things — db_url, chunk_time_interval, and the compiled entity filter
(__init__.py:71-86). This module is that front-end for the Spark engine,
with no Home Assistant or voluptuous dependency:

- :func:`parse_config` validates the same mapping shape (same keys, same
  defaults, same required/optional split, unknown-key rejection inside the
  block, extra top-level keys allowed — ``extra=vol.ALLOW_EXTRA``);
- :func:`load_yaml_config` accepts the literal YAML text a reference user
  already has;
- the result carries the same three artifacts, wired to this engine's
  consumers: ``entity_filter`` is an :class:`~ltss_spark.ingest.
  EntityFilter` (compiles to one pushdown-able boolean Column),
  ``db_url``/``chunk_time_interval`` feed
  :func:`ltss_spark.streaming.ingest.make_pg_upsert_sink` and
  :func:`ltss_spark.sources.pg_dialect.plan_setup_ddl`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ltss_spark.ingest import EntityFilter

DOMAIN = "ltss"
CONF_DB_URL = "db_url"
CONF_CHUNK_TIME_INTERVAL = "chunk_time_interval"
DEFAULT_CHUNK_TIME_INTERVAL = 2_592_000_000_000  # 30 days in µs — reference default

#: HA's valid_entity_id shape (homeassistant.core): lowercase
#: ``domain.object_id``, [a-z0-9_] segments, no leading/trailing/double
#: underscores. Mirrored so a config the reference accepts validates here
#: and one it rejects fails here too.
_ENTITY_ID_RE = re.compile(
    r"^(?!.+__)(?!_)[\da-z_]+(?<!_)\.(?!_)[\da-z_]+(?<!_)$"
)

_FILTER_KEYS = ("domains", "entities", "entity_globs")


class ConfigError(ValueError):
    """Invalid ``ltss:`` configuration — message mirrors what voluptuous
    would complain about (key path + reason)."""


@dataclass(frozen=True)
class LtssConfig:
    """The validated config: exactly what the reference's setup extracts
    (__init__.py:73-77)."""

    db_url: str
    chunk_time_interval: int = DEFAULT_CHUNK_TIME_INTERVAL
    entity_filter: EntityFilter = field(default_factory=EntityFilter)


def _string_list(value, path: str) -> tuple[str, ...]:
    """HA's ``cv.ensure_list`` + per-item string check: a single string
    becomes a one-element list; None becomes empty."""
    if value is None:
        return ()
    if isinstance(value, str):
        value = [value]
    if not isinstance(value, (list, tuple)):
        raise ConfigError(f"{path}: expected a string or list of strings")
    out = []
    for i, v in enumerate(value):
        if not isinstance(v, str) or not v:
            raise ConfigError(f"{path}[{i}]: expected a non-empty string")
        out.append(v)
    return tuple(out)


def _entity_ids(value, path: str) -> tuple[str, ...]:
    ids = _string_list(value, path)
    for e in ids:
        if not _ENTITY_ID_RE.match(e):
            raise ConfigError(
                f"{path}: {e!r} is not a valid entity id (domain.object_id)"
            )
    return ids


def _filter_block(block, path: str) -> dict[str, tuple[str, ...]]:
    if block is None:
        block = {}
    if not isinstance(block, dict):
        raise ConfigError(f"{path}: expected a mapping")
    unknown = set(block) - set(_FILTER_KEYS)
    if unknown:
        raise ConfigError(f"{path}: unknown keys {sorted(unknown)}")
    return {
        "domains": _string_list(block.get("domains"), f"{path}.domains"),
        "entities": _entity_ids(block.get("entities"), f"{path}.entities"),
        "entity_globs": _string_list(
            block.get("entity_globs"), f"{path}.entity_globs"
        ),
    }


def parse_config(config: dict) -> LtssConfig:
    """Validate a full config mapping (the document holding the ``ltss:``
    block) and return the engine-ready :class:`LtssConfig`.

    Shape and strictness mirror the reference's CONFIG_SCHEMA: the block
    itself rejects unknown keys (voluptuous default PREVENT_EXTRA), while
    anything OUTSIDE the block is ignored (``extra=vol.ALLOW_EXTRA`` —
    the reference shares the YAML file with the rest of Home Assistant).
    """
    if not isinstance(config, dict):
        raise ConfigError("config: expected a mapping")
    if DOMAIN not in config:
        raise ConfigError(f"config: missing the {DOMAIN!r} block")
    block = config[DOMAIN]
    if block is None:
        block = {}
    if not isinstance(block, dict):
        raise ConfigError(f"{DOMAIN}: expected a mapping")

    allowed = {CONF_DB_URL, CONF_CHUNK_TIME_INTERVAL, "include", "exclude"}
    unknown = set(block) - allowed
    if unknown:
        raise ConfigError(f"{DOMAIN}: unknown keys {sorted(unknown)}")

    db_url = block.get(CONF_DB_URL)
    if not isinstance(db_url, str) or not db_url:
        raise ConfigError(
            f"{DOMAIN}.{CONF_DB_URL}: required and must be a non-empty string"
        )

    chunk = block.get(CONF_CHUNK_TIME_INTERVAL, DEFAULT_CHUNK_TIME_INTERVAL)
    # cv.positive_int: an int > 0 (bool is an int subclass — reject it)
    if isinstance(chunk, bool) or not isinstance(chunk, int) or chunk <= 0:
        raise ConfigError(
            f"{DOMAIN}.{CONF_CHUNK_TIME_INTERVAL}: expected a positive integer"
        )

    inc = _filter_block(block.get("include"), f"{DOMAIN}.include")
    exc = _filter_block(block.get("exclude"), f"{DOMAIN}.exclude")
    return LtssConfig(
        db_url=db_url,
        chunk_time_interval=chunk,
        entity_filter=EntityFilter(
            include_domains=inc["domains"],
            include_entities=inc["entities"],
            include_globs=inc["entity_globs"],
            exclude_domains=exc["domains"],
            exclude_entities=exc["entities"],
            exclude_globs=exc["entity_globs"],
        ),
    )


def load_yaml_config(text: str) -> LtssConfig:
    """Parse the literal YAML a reference user already has (safe_load —
    config files are data, never code) and validate it."""
    import yaml

    try:
        doc = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ConfigError(f"invalid YAML: {e}") from e
    return parse_config(doc if doc is not None else {})
