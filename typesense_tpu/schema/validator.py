"""Document validation & coercion.

Behavior contract: /root/reference/src/validator.cpp (validator_t::
validate_index_in_memory + coerce_* methods) and DIRTY_VALUES semantics from
field.h (COERCE_OR_REJECT default, COERCE_OR_DROP, DROP, REJECT).
"""

from __future__ import annotations

from typing import Any

from typesense_tpu.core.errors import BadRequest
from typesense_tpu.schema import field as ftypes
from typesense_tpu.schema.field import Field

COERCE_OR_REJECT = "coerce_or_reject"
COERCE_OR_DROP = "coerce_or_drop"
DROP = "drop"
REJECT = "reject"

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


def _type_error(f: Field, expected: str) -> BadRequest:
    return BadRequest(f"Field `{f.name}` must be {expected}.")


def _coerce_scalar(f: Field, etype: str, v: Any, dirty: str):
    """Coerce one scalar to the element type; returns (ok, value)."""
    if etype == ftypes.STRING:
        if isinstance(v, str):
            return True, v
        if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
            if isinstance(v, bool):
                return True, ("true" if v else "false")
            if isinstance(v, (int, float)):
                return True, str(v)
        return False, v
    if etype == ftypes.INT32:
        if isinstance(v, bool):
            if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
                return True, int(v)
            return False, v
        if isinstance(v, int):
            if not (INT32_MIN <= v <= INT32_MAX):
                raise BadRequest(f"Field `{f.name}` exceeds the int32 range.")
            return True, v
        if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
            if isinstance(v, float) and v.is_integer():
                return True, int(v)
            if isinstance(v, str):
                try:
                    return True, int(v)
                except ValueError:
                    pass
        return False, v
    if etype == ftypes.INT64:
        if isinstance(v, bool):
            if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
                return True, int(v)
            return False, v
        if isinstance(v, int):
            return True, v
        if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
            if isinstance(v, float) and v.is_integer():
                return True, int(v)
            if isinstance(v, str):
                try:
                    return True, int(v)
                except ValueError:
                    pass
        return False, v
    if etype == ftypes.FLOAT:
        if isinstance(v, bool):
            if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
                return True, float(v)
            return False, v
        if isinstance(v, (int, float)):
            return True, float(v)
        if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP) and isinstance(v, str):
            try:
                return True, float(v)
            except ValueError:
                pass
        return False, v
    if etype == ftypes.BOOL:
        if isinstance(v, bool):
            return True, v
        if dirty in (COERCE_OR_REJECT, COERCE_OR_DROP):
            if isinstance(v, str) and v.lower() in ("true", "false"):
                return True, v.lower() == "true"
            if isinstance(v, int) and v in (0, 1):
                return True, bool(v)
        return False, v
    return True, v


def _validate_geopoint(f: Field, v: Any) -> list:
    if (isinstance(v, list) and len(v) == 2
            and all(isinstance(x, (int, float)) and not isinstance(x, bool) for x in v)):
        return [float(v[0]), float(v[1])]
    if isinstance(v, dict) and "lat" in v and "lng" in v:
        return [float(v["lat"]), float(v["lng"])]
    raise _type_error(f, "a 2 element array: [lat, lng]")


def validate_document(doc: dict, fields: list[Field],
                      dirty_values: str = COERCE_OR_REJECT,
                      prefiltered: bool = False) -> dict:
    """Validate & coerce `doc` in place against the schema; raises BadRequest.
    `prefiltered=True` means the caller already removed dynamic/object/`.*`
    entries (Collection._schema_plan caches that filter per schema)."""
    if not isinstance(doc, dict):
        raise BadRequest("Document is not a valid JSON object.")
    for f in fields:
        if not prefiltered and (f.name == ".*" or f.is_dynamic or f.is_object):
            continue
        present = f.name in doc and doc[f.name] is not None
        if not present:
            if not f.optional and f.index and not f.embed:
                raise BadRequest(f"Field `{f.name}` has been declared in the schema, "
                                 f"but is not found in the document.")
            continue
        v = doc[f.name]

        if f.is_vector:
            if not isinstance(v, list) or len(v) != f.num_dim or not all(
                    isinstance(x, (int, float)) and not isinstance(x, bool) for x in v):
                raise BadRequest(f"Field `{f.name}` must be an array of {f.num_dim} floats.")
            doc[f.name] = [float(x) for x in v]
            continue

        if f.type == ftypes.GEOPOLYGON:
            if not (isinstance(v, list) and len(v) >= 6 and len(v) % 2 == 0
                    and all(isinstance(x, (int, float)) and not isinstance(x, bool)
                            for x in v)):
                raise _type_error(f, "a flat array of at least 3 lat,lng pairs")
            doc[f.name] = [float(x) for x in v]
            continue
        if f.type == ftypes.GEOPOINT:
            doc[f.name] = _validate_geopoint(f, v)
            continue
        if f.type == ftypes.GEOPOINT_ARRAY:
            if not isinstance(v, list):
                raise _type_error(f, "an array of geopoints")
            doc[f.name] = [_validate_geopoint(f, x) for x in v]
            continue

        if f.is_array:
            if not isinstance(v, list):
                if dirty_values in (COERCE_OR_REJECT, REJECT):
                    raise _type_error(f, f"an array of type `{ftypes.element_type(f.type)}`")
                doc.pop(f.name, None)
                continue
            etype = ftypes.element_type(f.type)
            if etype == ftypes.STRING:
                # monomorphic fast path for the dominant case: all-str array
                # needs no coercion and no list rebuild
                for item in v:
                    if type(item) is not str:
                        break
                else:
                    continue
            out = []
            for item in v:
                if etype == ftypes.STRING and type(item) is str:
                    out.append(item)
                    continue
                ok, coerced = _coerce_scalar(f, etype, item, dirty_values)
                if ok:
                    out.append(coerced)
                elif dirty_values in (REJECT, COERCE_OR_REJECT):
                    raise _type_error(f, f"an array of type `{etype}`")
            doc[f.name] = out
        else:
            ftype = f.type
            # scalar fast paths: exact-type values pass through untouched
            if ftype == ftypes.STRING and type(v) is str:
                continue
            if ftype == ftypes.INT32 and type(v) is int:
                if not (INT32_MIN <= v <= INT32_MAX):
                    raise BadRequest(f"Field `{f.name}` exceeds the int32 range.")
                continue
            if ftype == ftypes.INT64 and type(v) is int:
                continue
            if ftype == ftypes.FLOAT and type(v) is float:
                continue
            if ftype == ftypes.BOOL and type(v) is bool:
                continue
            ok, coerced = _coerce_scalar(f, ftype, v, dirty_values)
            if ok:
                doc[f.name] = coerced
            elif dirty_values in (REJECT, COERCE_OR_REJECT):
                raise _type_error(f, f"of type `{f.type}`")
            else:
                doc.pop(f.name, None)
    return doc
