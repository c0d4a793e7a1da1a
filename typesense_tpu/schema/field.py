"""Field schema types.

Behavior contract: /root/reference/include/field.h:19-95 (field_types namespace,
fields property names) and the `field` struct (field.h:113-200). We keep the same
public JSON schema surface (`name`, `type`, `facet`, `optional`, `index`, `sort`,
`infix`, `locale`, `num_dim`, `vec_dist`, `range_index`, `stem`, `store`,
`token_separators`, `symbols_to_index`, `embed`, `reference`) so reference
clients work unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from typesense_tpu.core.errors import BadRequest

# field_types (field.h:19-40)
AUTO = "auto"
OBJECT = "object"
OBJECT_ARRAY = "object[]"
STRING = "string"
INT32 = "int32"
INT64 = "int64"
FLOAT = "float"
BOOL = "bool"
NIL = "nil"
GEOPOINT = "geopoint"
STRING_ARRAY = "string[]"
INT32_ARRAY = "int32[]"
INT64_ARRAY = "int64[]"
FLOAT_ARRAY = "float[]"
BOOL_ARRAY = "bool[]"
GEOPOINT_ARRAY = "geopoint[]"
GEOPOLYGON = "geopolygon"
IMAGE = "image"
STRING_STAR = "string*"  # coerced-to-string convenience type (field.h is_string_star)

VALID_TYPES = {
    AUTO, OBJECT, OBJECT_ARRAY, STRING, INT32, INT64, FLOAT, BOOL, GEOPOINT,
    STRING_ARRAY, INT32_ARRAY, INT64_ARRAY, FLOAT_ARRAY, BOOL_ARRAY,
    GEOPOINT_ARRAY, GEOPOLYGON, IMAGE, STRING_STAR,
}

ARRAY_TYPES = {
    OBJECT_ARRAY, STRING_ARRAY, INT32_ARRAY, INT64_ARRAY, FLOAT_ARRAY,
    BOOL_ARRAY, GEOPOINT_ARRAY,
}

STRING_TYPES = {STRING, STRING_ARRAY, STRING_STAR}
NUMERIC_TYPES = {INT32, INT64, FLOAT, INT32_ARRAY, INT64_ARRAY, FLOAT_ARRAY}
INT_TYPES = {INT32, INT64, INT32_ARRAY, INT64_ARRAY}
BOOL_TYPES = {BOOL, BOOL_ARRAY}
GEO_TYPES = {GEOPOINT, GEOPOINT_ARRAY}


def is_array(type_def: str) -> bool:
    return type_def in ARRAY_TYPES


def element_type(type_def: str) -> str:
    return type_def[:-2] if type_def.endswith("[]") else type_def


@dataclass
class Field:
    """One schema field. Mirrors the `field` struct (field.h:113)."""

    name: str
    type: str
    facet: bool = False
    optional: bool = False
    index: bool = True
    sort: bool | None = None       # default depends on type (numbers sortable by default)
    infix: bool = False
    locale: str = ""
    num_dim: int = 0               # >0 => vector field (float[])
    vec_dist: str = "cosine"
    range_index: bool = False
    stem: bool = False
    stem_dictionary: str = ""
    store: bool = True
    reference: str = ""            # "Coll.field" join reference
    async_reference: bool = False
    embed: dict | None = None      # {"from": [...], "model_config": {...}}
    token_separators: list[str] = dc_field(default_factory=list)
    symbols_to_index: list[str] = dc_field(default_factory=list)
    nested: bool = False
    hnsw_params: dict | None = None

    def __post_init__(self):
        if self.type not in VALID_TYPES:
            raise BadRequest(f"Field `{self.name}` has an invalid type `{self.type}`.")
        if self.sort is None:
            # numbers/bools are sortable by default; strings opt-in (field.h sort default logic)
            self.sort = self.type in NUMERIC_TYPES or self.type in BOOL_TYPES or self.type in GEO_TYPES
        if self.num_dim and self.type != FLOAT_ARRAY:
            raise BadRequest(f"Property `num_dim` is only allowed on a float[] field.")
        if self.vec_dist not in ("cosine", "ip"):
            raise BadRequest("Property `vec_dist` must be `cosine` or `ip`.")
        # classification flags precomputed ONCE: `name`/`type` are immutable
        # after construction (schema alters build new Field objects), and the
        # write pipeline reads these per document — property dispatch was 8
        # calls/doc, ~10% of a 2.2M bulk import (field.h:201-260)
        t = self.type
        self.is_string = t in STRING_TYPES
        self.is_numeric = t in NUMERIC_TYPES
        self.is_int = t in INT_TYPES
        self.is_bool = t in BOOL_TYPES
        self.is_geo = t in GEO_TYPES
        self.is_array = t in ARRAY_TYPES
        self.is_auto = t == AUTO
        self.is_object = t in (OBJECT, OBJECT_ARRAY)
        self.is_dynamic = (self.name == ".*" or ".*" in self.name
                           or self.is_auto or t == STRING_STAR)

    # --- classification helpers (field.h:201-260) ---
    # most flags are precomputed in __post_init__; is_float / is_vector stay
    # live because embed fields learn num_dim from the model after init
    # (collection.py _resolve_embed_dims)
    @property
    def is_float(self) -> bool:
        return self.type in (FLOAT, FLOAT_ARRAY) and not self.num_dim

    @property
    def is_vector(self) -> bool:
        return self.num_dim > 0

    # --- (de)serialization ---
    @classmethod
    def from_json(cls, obj: dict) -> "Field":
        if not isinstance(obj, dict):
            raise BadRequest("The `fields` value should be an array of objects.")
        if "name" not in obj or not isinstance(obj.get("name"), str):
            raise BadRequest("Field `name` must be a string.")
        if "type" not in obj or not isinstance(obj.get("type"), str):
            raise BadRequest(f"Field `{obj.get('name')}` must have a `type` string property.")
        known = {
            "name", "type", "facet", "optional", "index", "sort", "infix", "locale",
            "num_dim", "vec_dist", "range_index", "stem", "stem_dictionary", "store",
            "reference", "async_reference", "embed", "token_separators",
            "symbols_to_index", "nested", "hnsw_params",
        }
        kwargs = {k: v for k, v in obj.items() if k in known}
        for bkey in ("facet", "optional", "index", "infix", "range_index", "stem", "store"):
            if bkey in kwargs and not isinstance(kwargs[bkey], bool):
                raise BadRequest(f"The `{bkey}` property of the field `{obj['name']}` should be a boolean.")
        return cls(**kwargs)

    def to_json(self) -> dict:
        out: dict[str, Any] = {
            "name": self.name,
            "type": self.type,
            "facet": self.facet,
            "optional": self.optional,
            "index": self.index,
            "sort": bool(self.sort),
            "infix": self.infix,
            "locale": self.locale,
            "stem": self.stem,
            "store": self.store,
        }
        if self.stem_dictionary:
            out["stem_dictionary"] = self.stem_dictionary
        if self.num_dim:
            out["num_dim"] = self.num_dim
            out["vec_dist"] = self.vec_dist
            if self.hnsw_params:
                # accepted for API compatibility and echoed back; the TPU
                # index is a dense matmul scan / IVF, no graph to tune
                out["hnsw_params"] = self.hnsw_params
        if self.range_index:
            out["range_index"] = True
        if self.reference:
            out["reference"] = self.reference
            out["async_reference"] = self.async_reference
        if self.embed:
            out["embed"] = self.embed
        if self.token_separators:
            out["token_separators"] = self.token_separators
        if self.symbols_to_index:
            out["symbols_to_index"] = self.symbols_to_index
        return out
