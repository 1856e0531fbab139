"""State-TTL configuration registry.

Parity with the reference's conf handling in
``RocksDbStateStoreProvider.scala:699-769`` (constants ``:699-709``,
``getExpirationByQuery`` / ``getTTL`` / ``toInt`` / ``setExpireMode``
``:738-769``):

- ``spark.sql.streaming.stateStore.stateExpirySecs`` — global/default TTL,
  default ``-1`` (infinite).
- ``spark.sql.streaming.stateStore.stateExpirySecs.<queryName>`` — per-query
  override.
- ``spark.sql.streaming.stateStore.strictExpire`` — exact expiry enforced on
  read (default ``false`` = lazy expiry).
- Unnamed queries fall back to the ``UNNAMED_QUERY`` sentinel.

TTL semantics (reference ``README.md:34-49``):
  ``-1`` → infinite state;  ``0`` → stateless (every put immediately
  invisible);  ``n > 0`` → key expires n seconds after creation, last update
  or last access (expire-after-access: a read resets the clock).
"""

from __future__ import annotations

from dataclasses import dataclass

# Conf keys — identical strings to the reference (Provider.scala:699-707).
STATE_EXPIRY_SECS = "spark.sql.streaming.stateStore.stateExpirySecs"
DEFAULT_STATE_EXPIRY_SECS = -1
STATE_STRICT_EXPIRE = "spark.sql.streaming.stateStore.strictExpire"
DEFAULT_STATE_STRICT_EXPIRE = False
UNNAMED_QUERY = "UNNAMED_QUERY"  # Provider.scala:705

TTL_INFINITE = -1
TTL_STATELESS = 0


def _to_int(value, key: str) -> int:
    """Strict int parsing (Provider.scala:758-765 ``toInt``)."""
    try:
        return int(str(value))
    except (TypeError, ValueError):
        raise ValueError(f"Invalid integer value for conf '{key}': {value!r}") from None


def _to_bool(value) -> bool:
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("true", "1", "yes")


@dataclass(frozen=True)
class TtlConfig:
    """Resolved TTL settings for one query."""

    query_name: str
    ttl_secs: int
    strict: bool

    @property
    def is_infinite(self) -> bool:
        return self.ttl_secs < 0

    @property
    def is_stateless(self) -> bool:
        return self.ttl_secs == 0


def expiration_by_query(conf: dict[str, str]) -> dict[str, int]:
    """Build the queryName → TTL map from a conf dict.

    Mirrors ``getExpirationByQuery`` (Provider.scala:738-742): every conf key
    of form ``stateExpirySecs.<name>`` contributes, plus the bare
    ``stateExpirySecs`` key under the ``UNNAMED_QUERY`` sentinel (which also
    acts as the default for queries without an explicit entry).
    """
    prefix = STATE_EXPIRY_SECS + "."
    out: dict[str, int] = {
        UNNAMED_QUERY: _to_int(conf.get(STATE_EXPIRY_SECS, DEFAULT_STATE_EXPIRY_SECS),
                               STATE_EXPIRY_SECS)
    }
    for key, val in conf.items():
        if key.startswith(prefix):
            out[key[len(prefix):]] = _to_int(val, key)
    return out


def resolve_ttl(conf: dict[str, str], query_name: str | None) -> TtlConfig:
    """Resolve the effective TTL for one query (Provider.scala:360-376).

    Negative TTLs are coerced to ``-1`` (implicits.scala:66 semantics).
    """
    name = query_name or UNNAMED_QUERY
    by_query = expiration_by_query(conf)
    ttl = by_query.get(name, by_query[UNNAMED_QUERY])
    if ttl < 0:
        ttl = TTL_INFINITE
    strict = _to_bool(conf.get(STATE_STRICT_EXPIRE, DEFAULT_STATE_STRICT_EXPIRE))
    return TtlConfig(query_name=name, ttl_secs=ttl, strict=strict)


def set_state_timeout(conf_setter, query_name: str | None, expiry_secs: int) -> str:
    """Record a per-query TTL into a runtime conf.

    Mirrors the driver-side half of ``implicits.scala:40-71``: the conf is the
    only channel from driver to the (executor-side) state machinery. Returns
    the resolved query name. ``conf_setter`` is anything with ``.set(k, v)``
    (e.g. ``spark.conf``).
    """
    name = query_name or UNNAMED_QUERY
    ttl = max(int(expiry_secs), -1)  # coerce negatives to -1, implicits.scala:66
    conf_setter.set(f"{STATE_EXPIRY_SECS}.{name}", str(ttl))
    return name
