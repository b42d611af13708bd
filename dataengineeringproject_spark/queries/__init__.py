"""Driver-facing query modules. Each module registers its queries with
`dataengineeringproject_spark.registry` at import time."""

from __future__ import annotations

_LOADED = False


def load() -> None:
    global _LOADED
    if _LOADED:
        return
    from dataengineeringproject_spark.queries import (  # noqa: F401
        advanced,
        curation,
        graph_q,
        llm_text,
        llm_vectors,
        multimodal_q,
        reference_ops,
        relational,
        sources_q,
        sql_surface,
        streaming_q,
        tpch_extra,
        windows_q,
    )

    _LOADED = True
