"""``state_timeout`` — DataStreamWriter helper.

PySpark-native parity with the reference's ``DataStreamWriter`` implicit
``stateTimeout(runtimeConfig, queryName, expirySecs, checkpointLocation)``
(``implicits.scala:40-80``):

1. Resolve the query name: explicit arg → writer's ``queryName`` option →
   ``UNNAMED_QUERY`` sentinel. (The reference reads the writer's private
   ``extraOptions`` via reflection, implicits.scala:73-79; PySpark lets us
   pass options explicitly, so no reflection.)
2. Resolve the checkpoint root: explicit arg → writer option → session conf
   ``spark.sql.streaming.checkpointLocation`` → error (implicits.scala:53-64).
3. Record ``stateExpirySecs.<name>`` in the session conf (negatives coerced
   to −1, implicits.scala:66) — the conf is the only driver→state channel.
4. Force ``queryName`` and a per-query ``checkpointLocation`` =
   ``<root>/<name>`` on the writer (implicits.scala:68-70).
"""

from __future__ import annotations

import posixpath

from pyspark.sql.streaming import DataStreamWriter

from ..config import UNNAMED_QUERY, set_state_timeout


def state_timeout(
    writer: DataStreamWriter,
    conf,
    query_name: str | None = None,
    expiry_secs: int = -1,
    checkpoint_location: str | None = None,
) -> DataStreamWriter:
    """Apply per-query state-TTL settings to a streaming writer.

    ``conf`` is the session's runtime conf (``spark.conf``). Returns the
    writer (mutated in place, as PySpark writers are) for chaining.
    """
    name = query_name or UNNAMED_QUERY

    root = checkpoint_location
    if root is None:
        try:
            root = conf.get("spark.sql.streaming.checkpointLocation", None)
        except Exception:
            root = None
    if root is None:
        raise ValueError(
            "Checkpoint location must be set via the checkpoint_location "
            "argument or spark.sql.streaming.checkpointLocation"
        )  # implicits.scala:62-63 error contract

    set_state_timeout(conf, name, expiry_secs)
    return (
        writer.queryName(name)
        .option("checkpointLocation", posixpath.join(root, name))
    )
