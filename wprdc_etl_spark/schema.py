"""Declarative schema: marshmallow-style validation + coercion, vectorized.

Parity map (SURVEY.md §2.2/§2.3, A16/A17):

- ``pipeline/schema.py::BaseSchema`` is a ``marshmallow.Schema`` subclass;
  fields are typed, renamable (``load_from``), nullable (``allow_none``),
  defaulted (``missing``). ``schema().load(dict)`` coerces one row at a time
  in Python and returns (data, errors).
- ``pipeline/schema.py::BaseSchema.serialize_to_ckan_fields`` maps field
  types to CKAN datastore type strings for ``datastore_create``.

Engine version: a ``FieldSpec`` list compiles to *column expressions*
(trim → empty-string-to-null → try_cast → default fill → membership check),
evaluated JVM-side in whole-stage codegen. A per-field ``coerce=`` hook takes
a ``pandas.Series -> pandas.Series`` function and runs as an Arrow-batched
pandas UDF — the vectorized descendant of marshmallow custom fields /
``@pre_load`` hooks; never row-at-a-time Python (input_hint: "no per-row
Python"). Invalid rows are *diverted to a quarantine DataFrame with a
per-field error report*, not raised — the distributed analog of
marshmallow's (data, errors) pair, because throwing inside an executor for
1-in-10^6 bad rows would fail 10^10-row jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from wprdc_etl_spark.exceptions import InvalidConfigException

# marshmallow type name → (Spark type, CKAN datastore type string)
# Cite: pipeline/schema.py::BaseSchema.serialize_to_ckan_fields [H], exact
# CKAN spellings [M] (SURVEY §2.2).
_TYPE_MAP: dict[str, tuple[T.DataType, str]] = {
    "string": (T.StringType(), "text"),
    "integer": (T.LongType(), "int"),
    "float": (T.DoubleType(), "float"),
    "boolean": (T.BooleanType(), "bool"),
    "datetime": (T.TimestampType(), "timestamp"),
    "date": (T.DateType(), "date"),
    # marshmallow ``Time`` — rare in the reference ([L], SURVEY §2.2) but part
    # of the serializable type surface; Spark 4.1 has a native TimeType.
    "time": (T.TimeType(), "time"),
}


@dataclass
class FieldSpec:
    """One field's validation/coercion contract (a marshmallow field analog).

    - ``load_from``: source column name if different (marshmallow
      ``load_from`` / reference header-normalization, A14).
    - ``allow_none``: null allowed after coercion (marshmallow ``allow_none``).
    - ``default``: fill for nulls (marshmallow ``missing``).
    - ``strip`` + ``empty_as_null``: CSV hygiene the reference got from
      marshmallow string preprocessing.
    - ``allowed``: closed vocabulary (marshmallow ``validate.OneOf``).
    - ``coerce``: optional vectorized custom coercion
      (pandas.Series → pandas.Series), run as an Arrow pandas UDF *before*
      the cast. The extension point for marshmallow custom fields.
    """

    name: str
    type: str = "string"
    load_from: Optional[str] = None
    allow_none: bool = True
    default: Optional[object] = None
    strip: bool = True
    empty_as_null: bool = True
    allowed: Optional[list] = None
    coerce: Optional[Callable[[pd.Series], pd.Series]] = None

    def __post_init__(self) -> None:
        if self.type not in _TYPE_MAP:
            raise InvalidConfigException(
                f"field {self.name!r}: unknown type {self.type!r}; expected one of {sorted(_TYPE_MAP)}"
            )

    @property
    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.type][0]

    @property
    def ckan_type(self) -> str:
        return _TYPE_MAP[self.type][1]


_ERRORS_COL = "_errors"


@dataclass
class BaseSchema:
    """A dataset schema: ordered FieldSpecs + passthrough columns.

    Parity: ``pipeline/schema.py::BaseSchema`` (+ ``Meta.ordered``); the
    field order is preserved into the output projection.
    ``passthrough`` columns are kept as-is (the engine's event-envelope
    columns — op/event_sequence/event_ts — are passthrough, validation
    applies to the payload).
    """

    fields: list[FieldSpec] = field(default_factory=list)
    passthrough: list[str] = field(default_factory=list)

    # ---- compilation -----------------------------------------------------

    def _coerced(self, spec: FieldSpec, df: DataFrame) -> tuple[Column, Column, Column]:
        """→ (pre_cast, casted, out): the post-hygiene/pre-cast value, the raw
        try_cast result, and the final value with the default filled in.
        "Uncastable" must be judged on ``casted`` — BEFORE the default
        coalesce — or a non-null garbage value would be silently replaced by
        the default and pass validation (the documented contract is
        uncastable → error; defaults fill only genuine nulls)."""
        src = spec.load_from or spec.name
        if src not in df.columns:
            # marshmallow `missing`: absent input column → default (or null).
            absent = F.lit(None).cast("string")
            casted = F.lit(None).cast(spec.spark_type)
            return absent, casted, F.lit(spec.default).cast(spec.spark_type)
        col = F.col(src)
        if spec.coerce is not None:
            fn = pandas_udf(spec.coerce, returnType=T.StringType())
            col = fn(col.cast("string"))
        stringy = isinstance(df.schema[src].dataType, T.StringType) or spec.coerce is not None
        if stringy:
            if spec.strip:
                col = F.trim(col)
            if spec.empty_as_null:
                col = F.nullif(col, F.lit(""))
        pre_cast = col
        casted = col.try_cast(spec.spark_type)
        out = casted
        if spec.default is not None:
            out = F.coalesce(casted, F.lit(spec.default).cast(spec.spark_type))
        return pre_cast, casted, out

    def _field_error(self, spec: FieldSpec, pre_cast: Column, casted: Column, out: Column) -> Column:
        """Error string for this field, or NULL if valid."""
        errs = [
            F.when(pre_cast.isNotNull() & casted.isNull(), F.lit(f"{spec.name}: uncastable to {spec.type}"))
        ]
        if not spec.allow_none:
            errs.append(F.when(out.isNull(), F.lit(f"{spec.name}: required")))
        if spec.allowed is not None:
            errs.append(
                F.when(
                    out.isNotNull() & ~out.isin(spec.allowed),
                    F.lit(f"{spec.name}: not in allowed set"),
                )
            )
        return F.coalesce(*errs, F.lit(None).cast("string"))

    def apply(self, df: DataFrame) -> DataFrame:
        """Coerce all fields; append an ``_errors`` array column (empty = valid)."""
        proj: list[Column] = []
        errs: list[Column] = []
        for spec in self.fields:
            pre_cast, casted, out = self._coerced(spec, df)
            proj.append(out.alias(spec.name))
            errs.append(self._field_error(spec, pre_cast, casted, out))
        keep = [F.col(c) for c in self.passthrough if c in df.columns]
        err_arr = F.array_compact(F.array(*errs)) if errs else F.array().cast("array<string>")
        return df.select(*keep, *proj, err_arr.alias(_ERRORS_COL))

    def validate(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """→ (valid, quarantine). Valid rows lose the ``_errors`` column;
        quarantine keeps it for diagnostics (lineage counts it as
        ``rows_quarantined``). The distributed (data, errors) of
        ``marshmallow.Schema.load``.
        """
        applied = self.apply(df)
        is_valid = F.size(F.col(_ERRORS_COL)) == 0
        valid = applied.where(is_valid).drop(_ERRORS_COL)
        quarantine = applied.where(~is_valid)
        return valid, quarantine

    # ---- serialization (A17) --------------------------------------------

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(s.name, s.spark_type, s.allow_none or s.default is None) for s in self.fields]
        )

    def serialize_to_ddl(self) -> str:
        """Spark DDL string for CREATE TABLE — descendant of
        ``serialize_to_ckan_fields`` feeding ``datastore_create``.
        """
        return self.to_struct_type().simpleString()[len("struct<") : -1].replace(":", " ")

    def serialize_to_ckan_fields(self, capitalize: bool = False) -> list[dict]:
        """Exact-shape parity with the reference API:
        ``[{'id': name, 'type': ckan_type}, ...]``
        (``pipeline/schema.py::BaseSchema.serialize_to_ckan_fields``).
        """
        return [
            {"id": s.name.capitalize() if capitalize else s.name, "type": s.ckan_type}
            for s in self.fields
        ]


def event_payload_schema(known_langs: list[str]) -> BaseSchema:
    """The engine's standard change-event payload schema (FIXTURES.md §2):
    trims lang, quarantines unknown langs and null content on op != 'D'.
    Content nullability for deletes is handled as a row-level rule in
    streaming/job.py (it depends on ``op``, which is envelope, not payload).
    """
    return BaseSchema(
        fields=[
            FieldSpec("repo", "string", allow_none=False),
            FieldSpec("path", "string", allow_none=False),
            FieldSpec("commit", "string", allow_none=False),
            FieldSpec("lang", "string", allowed=known_langs),
            FieldSpec("content", "string", strip=False),
        ],
        passthrough=["event_sequence", "event_ts", "op"],
    )
