"""English feature descriptions + primitive catalog (reference
feature_base/feature_descriptions.py:6-160 and
primitives/utils.py:79-114). Driver-side metadata helpers — no Spark
jobs are run."""

from __future__ import annotations

from featuretools_spark.features import (
    AggregationFeature,
    DirectFeature,
    FeatureOutputSlice,
    GroupByTransformFeature,
    IdentityFeature,
    TransformFeature,
)


def list_primitives():
    """DataFrame cataloguing every registered primitive (reference
    list_primitives: name / type / description / valid_inputs)."""
    import pandas as pd

    from featuretools_spark.primitives import (
        AGG_PRIMITIVES,
        TRANSFORM_PRIMITIVES,
    )

    rows = []
    for kind, reg in (("aggregation", AGG_PRIMITIVES),
                      ("transform", TRANSFORM_PRIMITIVES)):
        for name, cls in sorted(reg.items()):
            doc = (cls.__doc__ or "").strip().split("\n")[0]
            rows.append({
                "name": name,
                "type": kind,
                "description": doc,
                "valid_inputs": ", ".join(
                    getattr(cls, "input_kinds", ("numeric",)) or ("none",)
                ),
            })
    return pd.DataFrame(rows, columns=["name", "type", "description",
                                       "valid_inputs"])


def describe_feature(feature, feature_descriptions=None,
                     primitive_templates=None) -> str:
    """English-language description of a feature (reference
    describe_feature). Custom overrides: feature_descriptions maps
    feature names to full descriptions; primitive_templates maps
    primitive names to '{}'-style templates applied to the input
    descriptions."""
    feature_descriptions = feature_descriptions or {}
    primitive_templates = primitive_templates or {}
    d = _describe(feature, feature_descriptions, primitive_templates)
    return d[:1].upper() + d[1:] + "."


def _describe(f, overrides, templates) -> str:
    name = f.get_name()
    if name in overrides:
        return overrides[name]
    if isinstance(f, IdentityFeature):
        return 'the "{}"'.format(f.column)
    if isinstance(f, DirectFeature):
        base = _describe(f.base_feature, overrides, templates)
        return '{} of the instance\'s "{}"'.format(base, f.parent_entity)
    if isinstance(f, FeatureOutputSlice):
        inner = _describe(f.base_feature, overrides, templates)
        return "{} (output {})".format(inner, f.n)

    inputs = [_describe(b, overrides, templates) for b in f.base_features]
    pname = f.primitive.name
    if pname in templates:
        prim_desc = templates[pname].format(*inputs)
    else:
        prim_desc = 'the {} of {}'.format(
            pname.replace("_", " "), ", ".join(inputs) or "the records"
        )

    if isinstance(f, GroupByTransformFeature):
        return '{} for each "{}"'.format(
            prim_desc, _strip_the(_describe(f.groupby, overrides, templates))
        )
    if isinstance(f, AggregationFeature):
        out = '{} of all instances of "{}"'.format(prim_desc, f.child_entity)
        if f.use_previous is not None:
            out += " in the previous {}".format(
                getattr(f.use_previous, "get_name", lambda: str(f.use_previous))()
                .lower()
            )
        if f.where is not None:
            out += " where {}".format(
                _strip_the(_describe(f.where, overrides, templates))
            )
        return out
    if isinstance(f, TransformFeature):
        return prim_desc
    return 'the "{}"'.format(name)


def _strip_the(s: str) -> str:
    return s[4:] if s.startswith("the ") else s
