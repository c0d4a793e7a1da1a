"""Nested-object flattening + auto/dynamic schema materialization.

Behavior contract: /root/reference/src/field.cpp (field::flatten_doc,
field::get_type) and collection.cpp auto-schema handling — nested objects
flatten to dotted field names (`a.b`), object arrays flatten each element's
values into one array per dotted path, `.*`/pattern dynamic fields create
concrete fields from document values with inferred types.
"""

from __future__ import annotations

import re

from typesense_tpu.schema import field as ftypes
from typesense_tpu.schema.field import Field


def flatten_paths(doc: dict) -> dict:
    """Dotted-path view of a nested document. Object arrays contribute one
    flat array per leaf path (field.cpp flatten_obj merging array elements)."""
    out: dict = {}

    def walk(value, prefix: str):
        if isinstance(value, dict):
            for k, v in value.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(value, list) and value and all(
                isinstance(x, dict) for x in value):
            merged: dict[str, list] = {}
            for elem in value:
                for k, v in flatten_paths(elem).items():
                    merged.setdefault(k, []).extend(
                        v if isinstance(v, list) else [v])
            for k, v in merged.items():
                out[f"{prefix}.{k}"] = v
        else:
            if prefix:
                out[prefix] = value

    walk(doc, "")
    return out


def infer_type(v) -> str | None:
    """JSON value -> field type (field::get_type, src/field.cpp). Unknown /
    empty -> None (skip until a typed value appears)."""
    if isinstance(v, bool):
        return ftypes.BOOL
    if isinstance(v, int):
        return ftypes.INT64
    if isinstance(v, float):
        return ftypes.FLOAT
    if isinstance(v, str):
        return ftypes.STRING
    if isinstance(v, list):
        for x in v:
            et = infer_type(x)
            if et in (ftypes.BOOL, ftypes.INT64, ftypes.FLOAT, ftypes.STRING):
                return et + "[]"
        return None
    return None


def _pattern_to_regex(name: str) -> re.Pattern:
    return re.compile("^" + re.escape(name).replace(r"\.\*", ".*") + "$")


def materialize_dynamic_fields(coll, doc: dict) -> list[Field]:
    """Create concrete fields for document keys matching dynamic schema
    entries (`.*`, `title_.*`, auto/string* types). Returns new fields."""
    dynamic = [f for f in coll.fields if f.is_dynamic]
    # declared `object`/`object[]` fields index ALL their child paths with
    # inferred types (field.cpp flatten_doc + auto children; reference
    # searches employees.name under an object[] employees field)
    objects = [f for f in coll.fields if f.is_object] \
        if coll.enable_nested_fields else []
    if not dynamic and not objects:
        return []
    flat = dict(doc)
    if coll.enable_nested_fields:
        flat.update(flatten_paths(doc))
    new_fields: list[Field] = []
    for key, value in flat.items():
        if key == "id":
            continue
        cur = coll.field_map.get(key)
        if cur is not None and not (cur.is_auto or cur.type == ftypes.STRING_STAR):
            continue
        if cur is not None:
            # a concrete-NAMED auto/string* field types itself from the
            # first value seen (reference keeps the dynamic entry plus a
            # materialized concrete field of the same name; we replace)
            if cur.is_auto:
                ft = infer_type(value)
            else:
                ft = (ftypes.STRING_ARRAY if isinstance(value, list)
                      else ftypes.STRING)
            if ft is None:
                continue
            new_fields.append(Field(
                name=key, type=ft, facet=cur.facet, optional=True,
                index=cur.index, sort=cur.sort if cur.sort else None,
                infix=cur.infix, locale=cur.locale,
                nested=("." in key and coll.enable_nested_fields)))
            continue
        if isinstance(value, dict) or value is None:
            continue
        parent = next((of for of in objects
                       if key.startswith(of.name + ".")), None)
        if parent is not None:
            ft = infer_type(value)
            if ft is not None:
                new_fields.append(Field(
                    name=key, type=ft, facet=parent.facet, optional=True,
                    index=parent.index, nested=True))
                continue
        for dyn in dynamic:
            pat = dyn.name if dyn.name != ".*" else ".*"
            if pat != ".*" and not _pattern_to_regex(pat).match(key):
                continue
            if dyn.type == ftypes.AUTO:
                ft = infer_type(value)
            elif dyn.type == ftypes.STRING_STAR:
                ft = (ftypes.STRING_ARRAY if isinstance(value, list)
                      else ftypes.STRING)
            else:
                ft = dyn.type
            if ft is None:
                continue
            nf = Field(name=key, type=ft, facet=dyn.facet, optional=True,
                       index=dyn.index, sort=dyn.sort if dyn.sort else None,
                       infix=dyn.infix, locale=dyn.locale,
                       nested=("." in key and coll.enable_nested_fields))
            new_fields.append(nf)
            break
    return new_fields
