"""Feature (de)serialization — the lineage artifact.

JSON schema mirrors the role of the reference's features_serializer
(feature_base/features_serializer.py:1-149 / features_deserializer.py:
1-147): a saved feature list fully reproduces the computation given
an EntitySet, so backfills carry their feature definitions alongside
the per-partition manifests (io.py).
"""

from __future__ import annotations

import json

from featuretools_spark.entityset import EntitySet, Relationship
from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    FeatureBase,
    GroupByTransformFeature,
    IdentityFeature,
    TransformFeature,
)
from featuretools_spark.primitives import (
    get_aggregation_primitive,
    get_transform_primitive,
)
from featuretools_spark.timedelta import Timedelta

SCHEMA_VERSION = 1


def _prim_params(prim) -> dict:
    out = {}
    for k, v in vars(prim).items():
        if isinstance(v, (int, float, str, bool, type(None), list, tuple)):
            out[k] = list(v) if isinstance(v, tuple) else v
    return out


def feature_to_dict(f: FeatureBase) -> dict:
    if isinstance(f, IdentityFeature):
        return {"type": "identity", "table": f.entity, "column": f.column}
    if isinstance(f, GroupByTransformFeature):
        return {
            "type": "groupby_transform",
            "primitive": f.primitive.name,
            "params": _prim_params(f.primitive),
            "base": [feature_to_dict(b) for b in f.base_features],
            "groupby": feature_to_dict(f.groupby),
        }
    if isinstance(f, TransformFeature):
        return {
            "type": "transform",
            "primitive": f.primitive.name,
            "params": _prim_params(f.primitive),
            "base": [feature_to_dict(b) for b in f.base_features],
        }
    if isinstance(f, AggregationFeature):
        return {
            "type": "aggregation",
            "primitive": f.primitive.name,
            "params": _prim_params(f.primitive),
            "parent_table": f.entity,
            "path": [
                [r.parent_name, r.parent_col, r.child_name, r.child_col]
                for r in f.relationship_path
            ],
            "base": [feature_to_dict(b) for b in f.base_features],
            "where": feature_to_dict(f.where) if f.where is not None else None,
            "use_previous": f.use_previous.get_name() if f.use_previous else None,
        }
    if isinstance(f, DirectFeature):
        return {
            "type": "direct",
            "child_table": f.entity,
            "relationship": [
                f.relationship.parent_name, f.relationship.parent_col,
                f.relationship.child_name, f.relationship.child_col,
            ],
            "base": feature_to_dict(f.base_feature),
        }
    raise TypeError(f"cannot serialize {type(f)}")


def feature_from_dict(d: dict, es: EntitySet) -> FeatureBase:
    t = d["type"]
    if t == "identity":
        return IdentityFeature(es, d["table"], d["column"])
    if t in ("transform", "groupby_transform"):
        prim = get_transform_primitive(d["primitive"])
        for k, v in (d.get("params") or {}).items():
            setattr(prim, k, v)
        base = [feature_from_dict(b, es) for b in d["base"]]
        if t == "groupby_transform":
            return GroupByTransformFeature(
                prim, base, feature_from_dict(d["groupby"], es)
            )
        return TransformFeature(prim, base)
    if t == "aggregation":
        prim = get_aggregation_primitive(d["primitive"])
        for k, v in (d.get("params") or {}).items():
            setattr(prim, k, v)
        base = [feature_from_dict(b, es) for b in d["base"]]
        path = [Relationship(*hop) for hop in d["path"]]
        where = feature_from_dict(d["where"], es) if d.get("where") else None
        up = Timedelta.parse(d["use_previous"]) if d.get("use_previous") else None
        return AggregationFeature(
            base if len(base) > 1 else base[0], d["parent_table"], prim,
            es=es, relationship_path=path, where=where, use_previous=up,
        )
    if t == "direct":
        rel = Relationship(*d["relationship"])
        return DirectFeature(
            feature_from_dict(d["base"], es), d["child_table"],
            es=es, relationship=rel,
        )
    raise ValueError(f"unknown feature type {t!r}")


def save_features(features: list[FeatureBase], path: str) -> None:
    doc = {
        "schema_version": SCHEMA_VERSION,
        "features": [feature_to_dict(f) for f in features],
        "names": [f.get_name() for f in features],
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)


def load_features(path: str, es: EntitySet) -> list[FeatureBase]:
    with open(path) as fh:
        doc = json.load(fh)
    feats = [feature_from_dict(d, es) for d in doc["features"]]
    for f, name in zip(feats, doc.get("names", [])):
        if f.get_name() != name:
            raise ValueError(
                f"round-trip name mismatch: {f.get_name()!r} != {name!r}"
            )
    return feats
