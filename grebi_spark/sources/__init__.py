"""Source scans — every reader produces the canonical long-form
(``grebi_spark.schema.INGESTED``) DataFrame.

The reference implements one Rust binary per input format (SURVEY.md §2.1).
Here each format is a function DataFrame→DataFrame built on Spark's native
readers; the open-schema JSONL path uses an Arrow-batched ``mapInPandas``
flattener (the one place the dynamic key space genuinely needs per-row
logic — everything downstream is pure DataFrame ops).
"""

from __future__ import annotations

import json
from typing import Any, Iterable

__all__ = [
    "render_scalar",
    "canonical_props_json",
    "flatten_entity",
]


def render_scalar(v: Any) -> str:
    """Render a JSON scalar to its string form.

    The reference keeps raw JSON bytes and compares byte-wise
    (03_merge/grebi_merge/src/main.rs:259-282); we normalise to a stable
    string rendering instead: strings verbatim, numbers/bools via JSON.
    """
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"))


def canonical_props_json(props: dict[str, Any]) -> str:
    """Canonical (sorted-key, compact) JSON for reified statement props.

    Values normalised to arrays of rendered scalars so equality is stable
    across sources — mirrors the reference's reified shape
    (grebi_shared/src/slice_merged_entity.rs:143-202).
    """
    norm: dict[str, list[str]] = {}
    for k, v in props.items():
        if v is None:
            continue
        vals = v if isinstance(v, list) else [v]
        norm[k] = [render_scalar(x) for x in vals if x is not None]
    return json.dumps(norm, sort_keys=True, separators=(",", ":"))


def flatten_entity(obj: dict[str, Any]) -> Iterable[tuple[str, str, str | None]]:
    """Flatten one JSON entity into (prop_key, value, value_props) rows.

    Semantics (mirroring the reference's entity model, SURVEY.md §1.1):
    - every property is multi-valued: scalars are one-element arrays
      (01_ingest/grebi_tsv2jsonl/src/main.rs:113-117)
    - a dict value shaped {"grebi:value": v, "grebi:properties": {...}}
      is a reified value (statement metadata)
    - any other dict value is kept as canonical JSON text
    - nulls / empty strings are dropped (cf. remove_empty_fields.rs)
    """
    for key, raw in obj.items():
        vals = raw if isinstance(raw, list) else [raw]
        for v in vals:
            if v is None:
                continue
            if isinstance(v, dict):
                if "grebi:value" in v:
                    target = v["grebi:value"]
                    props = v.get("grebi:properties", {})
                    yield key, render_scalar(target), canonical_props_json(props)
                else:
                    yield key, json.dumps(v, sort_keys=True, separators=(",", ":")), None
            else:
                s = render_scalar(v)
                if s == "":
                    continue
                yield key, s, None
